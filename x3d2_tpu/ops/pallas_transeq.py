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

# Mosaic's default scoped-VMEM cap is 16 MB, but v5e executes kernels
# with up to ~72 MB of scoped VMEM (measured; 127 MB fails). Raising the
# cap lets the hot kernels keep full-size tiles instead of halving them
# to fit, and unlocks merged multi-stage kernels.
VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


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
            compiler_params=VMEM_LIMIT,
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
# banded_blocks: band-truncated per-output-block operator slices, shared
# by the v3 kernels (pallas_kernels.py) and the sharded halo path
# (parallel/halo.py). The v1 banded kernel and the generic single-op
# pallas apply that lived here were superseded by the v3 design (bf16x3 +
# 3-stream windows) and by the einsum HIGH chain respectively, and were
# removed after measuring both slower.
# ---------------------------------------------------------------------------

_BW = 64  # default half-bandwidth (f32 truncation ~1e-9 for compact6 ops)


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
