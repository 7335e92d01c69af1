"""Pallas fused transeq direction-sweep kernel.

The TPU analogue of the reference's fused CUDA kernel
(transeq_3fused_dist, backend/cuda/kernels/distributed.f90:196-685, via
exec_dist_transeq_3fused): one pass over (u, v, w) computes, for one
direction, all nine operator applications and the skew-symmetric
combination

    rhs_c = -0.5*(conv*D1_c q_c + D1d_c (q_c*conv)) + nu*D2_c q_c

without materialising the nine intermediates in HBM. The operator
matrices (resolved compact schemes, ops/compact.py) live in VMEM; each
grid step holds a full-sweep-extent tile of the three velocity fields,
runs one OUTPUT ROW BLOCK of the matmuls on the MXU (blocking the output
keeps the scoped VMEM under the 16 MB limit) and the combine on the VPU.

XLA's fusion cannot do this across dot outputs (each einsum result
round-trips HBM), so this kernel saves ~6 field passes per direction.

Uniform meshes only (no stretch-correction term); the einsum path is the
general fallback (fused_transeq_supported).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_ref, v_ref, w_ref,
            m_du_a_ref, m_dud_a_ref, m_d2_a_ref,
            m_du_t_ref, m_dud_t_ref, m_d2_t_ref,
            du_ref, dv_ref, dw_ref, *, axis, nu, prec):
    """Inputs: full sweep extent; outputs/matrices: one row block along
    the sweep axis. The aligned component index equals `axis`
    (transeq_omp_dist role permutation, omp/backend.f90:158-184)."""
    u = u_ref[...]
    v = v_ref[...]
    w = w_ref[...]
    comps = (u, v, w)
    conv = comps[axis]
    outs = (du_ref, dv_ref, dw_ref)
    mats_aligned = (m_du_a_ref[...], m_dud_a_ref[...], m_d2_a_ref[...])
    mats_transverse = (m_du_t_ref[...], m_dud_t_ref[...], m_d2_t_ref[...])

    shape = u.shape

    def contract(M, f):
        """Apply the (bs, n) row block M along `axis` of the tile."""
        if axis == 0:
            n = shape[0]
            r = jax.lax.dot_general(
                M, f.reshape(n, -1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f.dtype, precision=prec)
            return r.reshape((M.shape[0],) + shape[1:])
        if axis == 2:
            # contract the lane dimension: f (tx, ty, n) x M^T
            return jax.lax.dot_general(
                f, M, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=f.dtype, precision=prec)
        # axis == 1: statically unrolled over the small leading dim --
        # 2-D dots avoid the (slow, miscompiled) in-kernel 3-D transpose
        rows = [jax.lax.dot_general(
            M, f[i], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f.dtype, precision=prec)[None]
            for i in range(shape[0])]
        return jnp.concatenate(rows, axis=0)

    # conv restricted to the output row block for the combine (sliced at
    # the ref level; value-level dynamic_slice has no Mosaic lowering)
    bidx = pl.program_id(2)
    bs = outs[0].shape[axis]
    conv_ref = (u_ref, v_ref, w_ref)[axis]
    sl = [slice(None)] * 3
    sl[axis] = pl.ds(bidx * bs, bs)
    conv_blk = conv_ref[tuple(sl)]

    for c in range(3):
        q = comps[c]
        m_du, m_dud, m_d2 = (mats_aligned if c == axis
                             else mats_transverse)
        dq = contract(m_du, q)
        dqd = contract(m_dud, q * conv)
        d2q = contract(m_d2, q)
        outs[c][...] = (-0.5 * (conv_blk * dq + dqd) + nu * d2q).astype(
            outs[c].dtype)


# per-axis in-tile free dims, chosen to fit the 16MB scoped VMEM with
# double buffering at n=256..512 (the output row block bs is picked per
# axis by _pick_bs)
_TILES = {
    0: dict(free=(8, 128)),
    1: dict(free=(4, 128)),  # leading dim free of tiling rules; smaller
    2: dict(free=(4, 128)),  # tiles keep axis-1/2 sweeps under the VMEM cap
}


def _pick_bs(axis, n):
    """Output row-block size satisfying the Mosaic last-two-dims tiling
    rules: axis 0 -> unconstrained (use 64), axis 1 -> multiple of 8,
    axis 2 -> multiple of 128 (or the full extent)."""
    if axis == 2:
        return 128 if n % 128 == 0 else (n if n <= 256 else None)
    for bs in (64, 32, 16, 8):
        if n % bs == 0:
            return bs
    return None


def make_fused_transeq(ops_axis, nu, axis, shape,
                       precision=jax.lax.Precision.HIGHEST,
                       interpret=False, bs=None):
    """Build fn(u, v, w) -> (du, dv, dw) for one direction sweep."""
    mats = (ops_axis.der1st.M, ops_axis.der1st_sym.M, ops_axis.der2nd.M,
            ops_axis.der1st_sym.M, ops_axis.der1st.M, ops_axis.der2nd_sym.M)
    n = shape[axis]
    other = [a for a in range(3) if a != axis]
    cfg = _TILES[axis]
    t0, t1 = cfg["free"]
    bs = bs or _pick_bs(axis, n)
    if bs is None or shape[other[0]] % t0 or shape[other[1]] % t1 or n % bs:
        raise ValueError(f"shape {shape} not tileable (axis {axis}, "
                         f"free {cfg['free']}, bs {bs})")

    in_block = [0, 0, 0]
    in_block[axis] = n
    in_block[other[0]] = t0
    in_block[other[1]] = t1
    out_block = list(in_block)
    out_block[axis] = bs

    def in_map(i, j, b):
        idx = [0, 0, 0]
        idx[other[0]] = i
        idx[other[1]] = j
        return tuple(idx)

    def out_map(i, j, b):
        idx = [0, 0, 0]
        idx[axis] = b
        idx[other[0]] = i
        idx[other[1]] = j
        return tuple(idx)

    # b varies fastest (last grid dim) so the input tiles stay resident
    grid = (shape[other[0]] // t0, shape[other[1]] // t1, n // bs)
    fin = pl.BlockSpec(tuple(in_block), in_map, memory_space=pltpu.VMEM)
    fout = pl.BlockSpec(tuple(out_block), out_map, memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((bs, n), lambda i, j, b: (b, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, axis=axis, nu=float(nu),
                             prec=precision)

    def fn(u, v, w):
        out_shape = [jax.ShapeDtypeStruct(u.shape, u.dtype)] * 3
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[fin] * 3 + [mspec] * 6,
            out_specs=[fout] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(u, v, w, *mats)

    return fn


def fused_transeq_supported(solver, shape) -> bool:
    """The fused kernel handles uniform meshes (no stretch correction)
    with tileable extents. Sweeps longer than 256 points exceed the 16MB
    scoped-VMEM budget with full-extent input tiles (measured: 384 needs
    21.6MB); the banded variant (round-2) lifts this."""
    if max(shape) > 256:
        return False
    for axis in range(3):
        o = solver.ops[axis]
        corr = o.der2nd.stretch_correct
        if corr is not None and np.any(corr):
            return False
        cfg = _TILES[axis]
        other = [a for a in range(3) if a != axis]
        bs = _pick_bs(axis, shape[axis])
        if (bs is None or shape[other[0]] % cfg["free"][0]
                or shape[other[1]] % cfg["free"][1]
                or shape[axis] % bs):
            return False
        if o.der1st.n_out != shape[axis] or o.der1st.n_in != shape[axis]:
            return False
    return True


# ---------------------------------------------------------------------------
# Banded variant: the resolved operator rows decay exponentially off the
# diagonal (ops/compact.py), so output row block b only needs input rows
# [128b - 64, 128b + 192) -- a 256-wide window instead of the full sweep.
# This halves the matmul flops vs the dense kernel, removes the full-extent
# input tiles from VMEM (enabling n > 256), and keeps the one-pass fusion.
# The window is made block-aligned by pre-rolling the fields by +64 along
# the sweep axis (one cheap elementwise pass amortised over all nine ops).
# Band truncation is guarded at build time like parallel/halo.py.
# ---------------------------------------------------------------------------

_BW = 64  # half-bandwidth (f32 truncation ~1e-9 for all compact6 ops)


def banded_blocks(op, w=_BW, bs=128, tol=1e-7):
    """Per-output-block banded weight slices W[b] = M[rows_b, rows_b-w :
    rows_b+bs+w] with periodic wrap / zero padding; raises if truncation
    exceeds `tol` relative to the max entry (default: f32 epsilon scale;
    the bf16x3 kernels pass 1e-6 since their matmul noise is ~1e-5)."""
    M = op.M64
    n = M.shape[0]
    if M.shape[1] != n or n % bs:
        raise ValueError("banded kernel needs square ops with n % 128 == 0")
    nb = n // bs
    W = np.zeros((nb, bs, bs + 2 * w))
    dropped = 0.0
    for b in range(nb):
        rows = M[b * bs:(b + 1) * bs]
        cols = np.arange(b * bs - w, (b + 1) * bs + w)
        if op.periodic:
            W[b] = rows[:, cols % n]
            mask = np.ones(n, bool)
            mask[cols % n] = False
        else:
            valid = (cols >= 0) & (cols < n)
            W[b][:, valid] = rows[:, cols[valid]]
            mask = np.ones(n, bool)
            mask[cols[valid]] = False
        dropped = max(dropped, np.abs(rows[:, mask]).max(initial=0.0))
    scale = np.abs(M).max()
    if dropped > tol * scale:
        raise ValueError(f"band w={w} truncates at {dropped / scale:.1e}")
    return W


def _banded_kernel(fa_ref, fb_ref, ca_ref, cb_ref, conv_ref,
                   m_du_ref, m_dud_ref, m_d2_ref,
                   out_ref, *, axis, nu, prec):
    """One component per call: two rolled blocks of the component (fa,fb),
    two rolled blocks of the aligned conv component (ca,cb), the aligned
    conv output block, and the three banded weight slices."""
    fa, fb = fa_ref[...], fb_ref[...]
    ca, cb = ca_ref[...], cb_ref[...]
    conv = conv_ref[...]
    m_du = m_du_ref[...][0]
    m_dud = m_dud_ref[...][0]
    m_d2 = m_d2_ref[...][0]
    bs = out_ref.shape[axis]

    def contract(M, xa, xb):
        Ma, Mb = M[:, :bs], M[:, bs:]
        if axis == 0:
            sh = xa.shape
            ra = jax.lax.dot_general(
                Ma, xa.reshape(bs, -1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=xa.dtype, precision=prec)
            rb = jax.lax.dot_general(
                Mb, xb.reshape(bs, -1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=xa.dtype, precision=prec)
            return (ra + rb).reshape(sh)
        if axis == 2:
            ra = jax.lax.dot_general(
                xa, Ma, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=xa.dtype, precision=prec)
            rb = jax.lax.dot_general(
                xb, Mb, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=xa.dtype, precision=prec)
            return ra + rb
        rows = []
        for i in range(xa.shape[0]):
            ra = jax.lax.dot_general(
                Ma, xa[i], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=xa.dtype, precision=prec)
            rb = jax.lax.dot_general(
                Mb, xb[i], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=xa.dtype, precision=prec)
            rows.append((ra + rb)[None])
        return jnp.concatenate(rows, axis=0)

    dq = contract(m_du, fa, fb)
    dqd = contract(m_dud, fa * ca, fb * cb)
    d2q = contract(m_d2, fa, fb)
    out_ref[...] = (-0.5 * (conv * dq + dqd) + nu * d2q).astype(
        out_ref.dtype)


def make_banded_transeq(ops_axis, nu, axis, shape, w=_BW, bs=128,
                        precision=jax.lax.Precision.HIGHEST,
                        interpret=False):
    """Banded fused transeq for one direction; fields must be pre-rolled
    by +w along `axis` (see banded_transeq for the wrapper). One pallas
    call per component keeps scoped VMEM within budget."""
    n = shape[axis]
    nb = n // bs
    if w != bs // 2:
        # two aligned bs-blocks of the rolled field must cover the window
        raise ValueError("banded transeq requires w == bs//2")
    if n < bs + 2 * w:
        # the banded window must not wrap onto itself
        raise ValueError(f"banded transeq needs n >= bs + 2w, got {n}")
    mats = {}
    for name, op in (("der1st", ops_axis.der1st),
                     ("der1st_sym", ops_axis.der1st_sym),
                     ("der2nd", ops_axis.der2nd),
                     ("der2nd_sym", ops_axis.der2nd_sym)):
        mats[name] = jnp.asarray(banded_blocks(op, w, bs), dtype=op.M.dtype)
    other = [a for a in range(3) if a != axis]
    free = {0: (8, 128), 1: (4, 128), 2: (4, 128)}[axis]
    t0, t1 = free
    if shape[other[0]] % t0 or shape[other[1]] % t1 or n % bs:
        raise ValueError(f"banded transeq: shape {shape} not tileable")

    blk = [0, 0, 0]
    blk[axis] = bs
    blk[other[0]] = t0
    blk[other[1]] = t1

    def mk_map(shift):
        def index_map(i, j, b):
            idx = [0, 0, 0]
            idx[axis] = (b + shift) % nb if shift else b
            idx[other[0]] = i
            idx[other[1]] = j
            return tuple(idx)
        return index_map

    grid = (shape[other[0]] // t0, shape[other[1]] // t1, nb)
    spec_a = pl.BlockSpec(tuple(blk), mk_map(0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec(tuple(blk), mk_map(1), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, bs, bs + 2 * w), lambda i, j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_banded_kernel, axis=axis, nu=float(nu),
                             prec=precision)

    def one(q_r, conv_r, conv, m_du, m_dud, m_d2):
        out_shape = jax.ShapeDtypeStruct(q_r.shape, q_r.dtype)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec_a, spec_b, spec_a, spec_b, spec_a] + [mspec] * 3,
            out_specs=pl.BlockSpec(tuple(blk), mk_map(0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(q_r, q_r, conv_r, conv_r, conv, m_du, m_dud, m_d2)

    def fn(rolled, conv):
        """rolled: (u_r, v_r, w_r); conv: aligned direction component."""
        conv_r = rolled[axis]
        outs = []
        for c in range(3):
            if c == axis:
                m_du, m_dud, m_d2 = (mats["der1st"], mats["der1st_sym"],
                                     mats["der2nd"])
            else:
                m_du, m_dud, m_d2 = (mats["der1st_sym"], mats["der1st"],
                                     mats["der2nd_sym"])
            outs.append(one(rolled[c], conv_r, conv, m_du, m_dud, m_d2))
        return tuple(outs)

    return fn


def banded_transeq(fns, u, v, w, axis, wband=_BW):
    """Apply the banded direction sweep: roll fields by +w so the banded
    window becomes two aligned blocks, then call the kernels."""
    comps = (u, v, w)
    rolled = tuple(jnp.roll(q, wband, axis=axis) for q in comps)
    return fns(rolled, comps[axis])


def banded_transeq_supported(solver, shape, w=_BW, bs=128) -> bool:
    """Banded kernel: uniform mesh, square periodic-or-padded operators,
    n % 128 == 0 and n >= 256 per axis."""
    for axis in range(3):
        o = solver.ops[axis]
        corr = o.der2nd.stretch_correct
        if corr is not None and np.any(corr):
            return False
        n = shape[axis]
        if n % bs or n < bs + 2 * w:
            return False
        other = [a for a in range(3) if a != axis]
        free = {0: (8, 128), 1: (4, 128), 2: (4, 128)}[axis]
        if shape[other[0]] % free[0] or shape[other[1]] % free[1]:
            return False
        if o.der1st.n_out != n or o.der1st.n_in != n:
            return False
        try:
            for op in (o.der1st, o.der1st_sym, o.der2nd, o.der2nd_sym):
                banded_blocks(op, w, bs)
        except ValueError:
            return False
    return True


# ---------------------------------------------------------------------------
# Generic single-operator Pallas apply: the dense kernel machinery reused
# for one (matrix, field) pair, optionally with a second stacked matrix on
# the same input. Avoids the XLA transposes that einsum inserts for
# axis-1/2 contractions; used by the projection stages on TPU.
# ---------------------------------------------------------------------------


def _apply_kernel(f_ref, m_ref, out_ref, *, axis, prec):
    f = f_ref[...]
    M = m_ref[...]
    shape = f.shape
    if axis == 0:
        n = shape[0]
        r = jax.lax.dot_general(
            M, f.reshape(n, -1), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f.dtype, precision=prec)
        out_ref[...] = r.reshape((M.shape[0],) + shape[1:]).astype(
            out_ref.dtype)
    elif axis == 2:
        r = jax.lax.dot_general(
            f, M, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f.dtype, precision=prec)
        out_ref[...] = r.astype(out_ref.dtype)
    else:
        rows = [jax.lax.dot_general(
            M, f[i], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f.dtype, precision=prec)[None]
            for i in range(shape[0])]
        out_ref[...] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


def make_pallas_apply(M, axis, shape_in, n_out=None,
                      precision=jax.lax.Precision.HIGHEST, interpret=False):
    """fn(f) applying M (n_out, n_in) along `axis` of f (shape_in)."""
    n_in = shape_in[axis]
    n_out = n_out or M.shape[0]
    if M.shape != (n_out, n_in):
        raise ValueError("matrix/shape mismatch")
    other = [a for a in range(3) if a != axis]
    free = {0: (8, 128), 1: (8, 128), 2: (8, 128)}[axis]
    t0, t1 = free
    if shape_in[other[0]] % t0 or shape_in[other[1]] % t1:
        raise ValueError("shape not tileable")
    bs = _pick_bs(axis, n_out)
    if bs is None or n_out % bs or n_in > 512:
        raise ValueError("unsupported sizes for pallas apply")

    in_blk = [0, 0, 0]
    in_blk[axis] = n_in
    in_blk[other[0]] = t0
    in_blk[other[1]] = t1
    out_blk = list(in_blk)
    out_blk[axis] = bs
    shape_out = list(shape_in)
    shape_out[axis] = n_out

    def in_map(i, j, b):
        idx = [0, 0, 0]
        idx[other[0]] = i
        idx[other[1]] = j
        return tuple(idx)

    def out_map(i, j, b):
        idx = [0, 0, 0]
        idx[axis] = b
        idx[other[0]] = i
        idx[other[1]] = j
        return tuple(idx)

    grid = (shape_in[other[0]] // t0, shape_in[other[1]] // t1, n_out // bs)
    kern = functools.partial(_apply_kernel, axis=axis, prec=precision)
    Md = jnp.asarray(M)

    def fn(f):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(tuple(in_blk), in_map,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((bs, n_in), lambda i, j, b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(tuple(out_blk), out_map,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(tuple(shape_out), f.dtype),
            interpret=interpret,
        )(f, Md)

    return fn
