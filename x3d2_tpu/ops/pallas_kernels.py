"""Pallas fused transeq kernels (bf16x3, banded, accumulated).

TPU analogue of the reference's fused CUDA transeq kernel
(transeq_3fused_dist, src/backend/cuda/kernels/distributed.f90:196-685):
one pass per direction over (u, v, w) computes all nine compact-operator
applications and the skew-symmetric combine

    rhs_c = -0.5*(conv*D1_c q_c + D1d_c (q_c*conv)) + nu*D2_c q_c

without materialising intermediates in HBM.

Design points (vs the v1 kernel in pallas_transeq.py):

1. **Manual bf16x3 ("HIGH") matmuls.** Mosaic only lowers DEFAULT (1 bf16
   pass) and HIGHEST (bf16x6) dot precisions; v1 kernels paid bf16x6.
   Splitting each f32 operand into hi+lo bfloat16 parts and taking the
   three significant cross products reproduces XLA's Precision.HIGH
   (~1e-7 relative error) at 2x the v1 MXU throughput. Matrices are
   pre-split host-side; fields are split once per tile in-kernel.

2. **Parametric banded blocks (bs, w).** The resolved operators decay
   exponentially off the diagonal (ops/compact.py), so an output block of
   bs rows only reads a window of bs+2w input planes. compact6-family
   decay reaches f32 epsilon by w=32 (guarded by banded_blocks'
   truncation check), so non-lane axes run (bs=64, w=32): a single
   128-wide MXU K tile per dot instead of v1's 256 — half the flops.
   The lane axis (axis 2) keeps bs=128 (last-dim tiling rule) with
   window 256. Fields are pre-rolled by +w so the window is covered by
   two aligned blocks; du/d2u rows are stacked into one (2bs, win) dot.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_transeq import VMEM_LIMIT, banded_blocks

_BF = jnp.bfloat16


def _cparams(ngrid):
    """Compiler params for an all-independent-blocks grid. X3D2_DIMSEM=1
    marks every grid dim `parallel` (A/B experiment vs the `arbitrary`
    default, which serialises grid iterations in Mosaic's pipeliner)."""
    if os.environ.get("X3D2_DIMSEM", "0") == "1":
        return pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT.vmem_limit_bytes,
            dimension_semantics=("parallel",) * ngrid)
    return VMEM_LIMIT


def split_hi_lo(M: np.ndarray, terms: int = 2):
    """Host-side f32 -> `terms` bfloat16 parts (numpy). 2 parts capture
    ~16 mantissa bits (the HIGH decomposition); 3 capture all 24
    (HIGHEST). terms=0: unsplit f32 (native-precision dots)."""
    M32 = np.asarray(M, np.float32)
    if terms == 0:
        return (M32,)
    parts = []
    rem = M32
    for _ in range(terms):
        p = rem.astype(jnp.bfloat16)
        rem = rem - np.asarray(p, np.float32)
        parts.append(np.asarray(p))
    return tuple(parts)


def _split(x, terms: int = 2):
    """In-kernel f32 -> `terms` bf16 parts. terms=0: no split (native
    f32 operands, for Mosaic's own HIGHEST lowering)."""
    if terms == 0:
        return (x,)
    parts = []
    rem = x
    for _ in range(terms):
        p = rem.astype(_BF)
        rem = rem - p.astype(x.dtype)
        parts.append(p)
    return tuple(parts)


def _dot_split(Ms, xs, dn, prec=jax.lax.Precision.DEFAULT):
    """Multi-term bf16 contraction of split operands, keeping the cross
    products whose combined order matters: with 2+2 parts this is bf16x3
    (== Precision.HIGH, drops lo*lo); with 3+3 parts bf16x6
    (== Precision.HIGHEST, keeps terms of order <= hi*lo2)."""
    nM, nx = len(Ms), len(xs)
    # keep terms with combined order <= terms-1: 2+2 parts -> 3 products
    # (hh, hl, lh == HIGH); 3+3 parts -> 6 products (== HIGHEST)
    keep = min(nM, nx) - 1
    acc = None
    for i in range(nM):
        for j in range(nx):
            if i + j > keep:
                continue
            t = jax.lax.dot_general(Ms[i], xs[j], dimension_numbers=dn,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            acc = t if acc is None else acc + t
    return acc


def _dot3(Mh, Ml, xh, xl, dn, prec=jax.lax.Precision.DEFAULT):
    """bf16x3 contraction: (Mh+Ml) @ (xh+xl) dropping the lo*lo term.
    Equivalent to one Precision.HIGH f32 dot; 3 full-rate MXU passes."""
    return _dot_split((Mh, Ml), (xh, xl), dn, prec)


def _contract_split(Ms, xs, axis, prec=jax.lax.Precision.DEFAULT):
    """Apply a split (rows, win) matrix along `axis` of a split 3-D tile
    (bf16x3 for 2-part splits, bf16x6 for 3-part; unsplit f32 operands
    with prec=HIGHEST use Mosaic's native bf16x6 lowering)."""
    dn_l = (((1,), (0,)), ((), ()))   # M @ flat
    if axis == 0:
        sh = xs[0].shape
        r = _dot_split(Ms, tuple(x.reshape(sh[0], -1) for x in xs), dn_l,
                       prec)
        return r.reshape((Ms[0].shape[0],) + sh[1:])
    if axis == 2:
        dn = (((2,), (1,)), ((), ()))  # f @ M^T, contract lane dim
        return _dot_split(xs, Ms, dn, prec)
    # axis == 1: unroll the (small) leading dim; 2-D dots avoid in-kernel
    # 3-D transposes which Mosaic handles poorly
    rows = [_dot_split(Ms, tuple(x[i] for x in xs), dn_l, prec)[None]
            for i in range(xs[0].shape[0])]
    return jnp.concatenate(rows, axis=0)


def _free_dims(axis):
    """Default in-tile extents of the two non-sweep axes. Larger tiles
    amortise MXU issue latency over a bigger batch; bounded by VMEM."""
    return {0: (16, 128), 1: (16, 128), 2: (8, 128)}[axis]


_BAND_TOL = 1e-6  # bf16x3 matmul noise (~1e-5) dominates this truncation


def _stack_banded(op_pair, w, bs):
    """Row-stack two ops' banded blocks: (nb, 2bs, bs+2w) float64."""
    b1 = banded_blocks(op_pair[0], w, bs, tol=_BAND_TOL)
    b2 = banded_blocks(op_pair[1], w, bs, tol=_BAND_TOL)
    return np.concatenate([b1, b2], axis=1)


# ---------------------------------------------------------------------------
# v3: roll-free 3-stream windows + cross-direction accumulation.
#
# For non-lane axes the window [bs*b - w, bs*b + bs + w) is fetched as
# three aligned streams: a w-plane "left" block, the bs-plane mid block
# and a w-plane "right" block (block sizes may differ per stream; index
# maps are in units of each stream's own block size). With w=16 this cuts
# the field read traffic from 2x (two-aligned-block cover) to 1.25-1.5x
# and needs no jnp.roll pre-pass. The lane axis keeps the rolled
# two-stream cover (lane blocks must be 128-multiples).
#
# `accumulate=True` aliases three accumulator inputs onto the outputs
# (donated in-place add), so summing the three direction sweeps costs no
# extra HBM passes — the analogue of the reference's sum_yintox/zintox
# (src/backend/backend.f90, cuda/kernels/reorder.f90:257-316) without
# materialising per-direction partials.
# ---------------------------------------------------------------------------


def _transeq_kernel_v3(*refs, axis, nu, w, bs, nstream, accumulate,
                       terms=2, ab_olds=0, halo_ext=False, xdiv=False,
                       nbh=0, upd=None, base_sep=False):
    """refs layout: [acc_u, acc_v, acc_w]? + nstream
    blocks per field * 3 + [old_{j,c} blocks]*
    + 4*terms matrix refs (sa, st, da, dt split parts) + [xdiv parity
    transform parts (sx Me,Mo then ix Me,Mo)]? + [shard block offset]?
    + [ab coeffs]? + outputs (3, or 6 when update-fused: u',v',w'
    followed by the rhs fields that become olds[0] / the RK stage
    derivative, or 9 with xdiv: + the projection's x-transformed
    du,dv,dw).

    (A merged momentum+species variant existed in round 3 — phi riding
    these sweeps — but MEASURED 0.63x the standalone species kernels on
    chip (7.96 vs 4.99 ms, validation/onchip_queue_prof_species.log r3)
    and was removed; scalar transport runs through the standalone
    _species_kernel_v3 sweeps below, reference transeq_species
    solver.f90:507-601.)

    With halo_ext, the l/r stream blocks come from a halo-extended shard
    (no wraparound) and the matrix stacks hold the GLOBAL banded blocks,
    indexed at b + shard offset (read from SMEM).

    `upd` (default: ab_olds > 0) applies the fused time update; with
    base_sep the update base is read from three extra operand blocks
    (the RK step-initial fields f0, time_integrator.f90:166-231) instead
    of the sweep's own mid blocks — u' = f0 + co[0]*rhs + sum co[j]*k_j,
    which with olds = previous-stage derivatives is exactly the RK
    substage update (zero-coefficient stages simply pass no olds).

    With xdiv (axis 0, AB-fused final sweep), the kernel ALSO emits the
    projection's forward x transforms of the updated velocities in the
    block-parity basis of make_x_apply(parity='fwd'): each x block b of
    u' contributes Me[:, cols(b)] @ u'_b to the even modes and
    +/- Mo[:, cols(b)] @ u'_b to the odd modes (sign by input half),
    accumulated K-blocked in VMEM scratch and written once — the three
    x-stage divergence kernels and their full-field re-reads vanish.
    MEASURED: wins at 256^3 (8.53 vs 9.08 ms/step), LOSES at 512^3
    (74.9 vs 66.3: the per-grid-step transform dots and scratch traffic
    stop hiding under the sweep's DMA), so callers gate it by size."""
    i = 0
    accs = None
    if accumulate:
        accs = refs[:3]
        i = 3
    fields = []
    for _ in range(3):
        fields.append(refs[i:i + nstream])
        i += nstream
    olds = refs[i:i + 3 * ab_olds]
    i += 3 * ab_olds
    if upd is None:
        upd = ab_olds > 0
    bases = None
    if base_sep:
        bases = refs[i:i + 3]
        i += 3
    nparts = max(terms, 1)
    nm = 4 * nparts
    mat_refs = refs[i:i + nm]
    i += nm
    xm = None
    if xdiv:
        xm = refs[i:i + 4 * nparts]
        i += 4 * nparts
    off_ref = None
    if halo_ext:
        off_ref = refs[i]
        i += 1
    co_ref = None
    if upd:
        co_ref = refs[i]
        i += 1
    outs = refs[i:]
    scratch = None
    if xdiv:
        # scratch_shapes refs arrive after the outputs
        scratch = outs[-3:]
        outs = outs[:-3]
    b = pl.program_id(2)
    if halo_ext:
        b = b + off_ref[0]

    def window(parts):
        if nstream == 2:
            a_ref, b_ref = parts
            sl = [slice(None)] * 3
            sl[axis] = slice(0, 2 * w)
            return jnp.concatenate([a_ref[...], b_ref[tuple(sl)]],
                                   axis=axis), None
        l_ref, m_ref, r_ref = parts
        mid = m_ref[...]
        return jnp.concatenate([l_ref[...], mid, r_ref[...]],
                               axis=axis), mid

    wins, mids = [], []
    for f in fields:
        wv, mv = window(f)
        wins.append(wv)
        mids.append(mv)
    convw = wins[axis]
    if nstream == 2:
        sl = [slice(None)] * 3
        sl[axis] = slice(w, w + bs)
        conv = convw[tuple(sl)]
    else:
        conv = mids[axis]

    sa = tuple(m[b] for m in mat_refs[0:nparts])
    st = tuple(m[b] for m in mat_refs[nparts:2 * nparts])
    da = tuple(m[b] for m in mat_refs[2 * nparts:3 * nparts])
    dt = tuple(m[b] for m in mat_refs[3 * nparts:4 * nparts])
    prec = (jax.lax.Precision.HIGHEST if terms == 0
            else jax.lax.Precision.DEFAULT)

    for c in range(3):
        q = wins[c]
        qs = _split(q, terms)
        p = q * convw
        ps = _split(p, terms)
        S, D = (sa, da) if c == axis else (st, dt)
        stacked = _contract_split(S, qs, axis, prec)
        sl1 = [slice(None)] * 3
        sl1[axis] = slice(0, bs)
        sl2 = [slice(None)] * 3
        sl2[axis] = slice(bs, 2 * bs)
        dq = stacked[tuple(sl1)]
        d2q = stacked[tuple(sl2)]
        dqd = _contract_split(D, ps, axis, prec)
        r = -0.5 * (conv * dq + dqd) + nu * d2q
        if accumulate:
            r = r + accs[c][...]
        if upd:
            # fused time update: u' = base + dt*c0*rhs
            # + sum_j dt*c_{j+1}*old_j (ab_step / rk_substage); rhs
            # written as the new olds[0] / stage derivative
            rstore = r.astype(outs[3 + c].dtype)
            outs[3 + c][...] = rstore
            base_c = bases[c][...] if base_sep else mids[c]
            unew = base_c + co_ref[0, 0] * r
            for j in range(ab_olds):
                # history may be stored bf16 (X3D2_BF16_OLDS): upcast
                # before the coefficient multiply so the combination
                # runs at state precision
                unew = unew + co_ref[0, 1 + j] * \
                    olds[3 * j + c][...].astype(r.dtype)
            if outs[3 + c].dtype != r.dtype:
                # reduced-history error feedback: the rhs stored above
                # re-enters the next ab_olds updates with the steady
                # coefficients; co_ref[0,4] = dt*sum(c_1..c_k) pre-pays
                # that rounding now, while r is exact in registers
                # (time_integrators.future_coeff_sum) — restores KE
                # parity at zero extra HBM traffic
                unew = unew + co_ref[0, 4] * (r - rstore.astype(r.dtype))
            outs[c][...] = unew.astype(outs[c].dtype)
            if xdiv:
                # K-blocked partial transform of this u' block into the
                # div output (sx for u, ix for v/w). The parity mats
                # ride TRANSPOSED so the per-block column window is a
                # sublane-dim dynamic slice (bs=64 is provably
                # 8-aligned; lane-dim slices need 128). Accumulation
                # runs in VMEM scratch; the b-revisited output block is
                # written ONCE on the last b (a kernel that READS its
                # output forces Mosaic to fetch it per (i, j) tile).
                Me = xm[:nparts] if c == 0 else xm[2 * nparts:3 * nparts]
                Mo = (xm[nparts:2 * nparts] if c == 0
                      else xm[3 * nparts:4 * nparts])
                cs = (b % nbh) * bs
                MeS = tuple(m[pl.ds(cs, bs), :] for m in Me)
                MoS = tuple(m[pl.ds(cs, bs), :] for m in Mo)
                sh = unew.shape
                us = tuple(p.reshape(bs, -1)
                           for p in _split(unew, terms))
                dn_t = (((0,), (0,)), ((), ()))  # M^T-slice @ flat
                E = _dot_split(MeS, us, dn_t, prec)
                O = _dot_split(MoS, us, dn_t, prec)
                sgn = jnp.where(b < nbh, 1.0, -1.0).astype(E.dtype)
                part = jnp.concatenate([E, sgn * O], axis=0)
                part = part.reshape((2 * E.shape[0],) + sh[1:])
                sref = scratch[c]
                dref = outs[6 + c]

                @pl.when(pl.program_id(2) == 0)
                def _():
                    sref[...] = part

                @pl.when(pl.program_id(2) > 0)
                def _():
                    sref[...] = sref[...] + part

                @pl.when(pl.program_id(2) == 2 * nbh - 1)
                def _():
                    dref[...] = sref[...].astype(dref.dtype)
        else:
            outs[c][...] = r.astype(outs[c].dtype)


def _sweep_scaffold(axis, shape, free, n, nb, bs, w, lane, nstream,
                    halo_ext, n_shards):
    """Shared grid/BlockSpec scaffolding for the windowed direction
    sweeps (momentum AND species): returns (grid, out_spec, fspecs,
    sspec, dspec, blk_of, map_of). The fspecs encode the roll-free
    window cover per variant — any halo/index-map fix lands here once."""
    other = [a for a in range(3) if a != axis]
    if free is None:
        # full-size tiles even for the bf16x6 and AB-fused variants: the
        # raised VMEM_LIMIT covers their extra operands (the halved
        # tiles this used to need doubled the grid and cost ~2x)
        free = _free_dims(axis)
    t0, t1 = free
    if shape[other[0]] % t0 or shape[other[1]] % t1:
        raise ValueError(f"shape {shape} free dims not tileable")

    def blk_of(extent):
        blk = [0, 0, 0]
        blk[axis] = extent
        blk[other[0]] = t0
        blk[other[1]] = t1
        return tuple(blk)

    def map_of(fn_ax):
        def index_map(i, j, b):
            idx = [0, 0, 0]
            idx[axis] = fn_ax(b)
            idx[other[0]] = i
            idx[other[1]] = j
            return tuple(idx)
        return index_map

    grid = (shape[other[0]] // t0, shape[other[1]] // t1, nb)
    out_spec = pl.BlockSpec(blk_of(bs), map_of(lambda b: b),
                            memory_space=pltpu.VMEM)
    if lane and halo_ext:
        # ext = concat(left_halo_w, local, right_halo_w): the window
        # [b*bs-w, b*bs+bs+w) sits at ext blocks b, b+1 — no wrap
        fspecs = [pl.BlockSpec(blk_of(bs), map_of(lambda b: b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(blk_of(bs), map_of(lambda b: b + 1),
                               memory_space=pltpu.VMEM)]
    elif lane:
        fspecs = [pl.BlockSpec(blk_of(bs), map_of(lambda b: b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(blk_of(bs), map_of(lambda b: (b + 1) % nb),
                               memory_space=pltpu.VMEM)]
    elif halo_ext:
        # l/r stream blocks come from the halo-extended operand (in units
        # of w planes); the mid block from the plain local shard
        r = bs // w
        fspecs = [
            pl.BlockSpec(blk_of(w), map_of(lambda b: b * r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_of(bs), map_of(lambda b: b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_of(w), map_of(lambda b: (b + 1) * r + 1),
                         memory_space=pltpu.VMEM),
        ]
    else:
        r = bs // w
        nw = n // w
        fspecs = [
            pl.BlockSpec(blk_of(w), map_of(lambda b: (b * r - 1) % nw),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_of(bs), map_of(lambda b: b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_of(w), map_of(lambda b: ((b + 1) * r) % nw),
                         memory_space=pltpu.VMEM),
        ]
    win = bs + 2 * w
    nb_g = nb * n_shards  # matrix stacks hold the GLOBAL banded blocks
    sspec = pl.BlockSpec((nb_g, 2 * bs, win), lambda i, j, b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((nb_g, bs, win), lambda i, j, b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return grid, out_spec, fspecs, sspec, dspec, blk_of, map_of


def make_transeq_dir_v3(ops_axis, nu, axis, shape, w=None, bs=None,
                        free=None, accumulate=False, interpret=False,
                        terms=2, ab_olds=0, n_shards=1, ab_alias=True,
                        xdiv_mats=None, upd=None, base_sep=False,
                        olds_dtype=None, acc_dtype=None, acc_out=True):
    """One direction sweep: fn(u, v, w[, acc3]) -> (du, dv, dw).

    acc_dtype (X3D2_BF16_ACC): dtype of the cross-direction rhs
    partial streams. Like the AB history, the partials only enter the
    state update scaled by dt*c_j, so storing them bf16 halves the
    12-pass accumulator traffic (d2 writes 3, d0 reads+writes 3+3, the
    final sweep reads 3) for a ~4e-3 relative rounding on an O(dt)
    term. Intermediate (non-upd) sweeps store their outputs at
    acc_dtype; the upd sweep only READS acc at that dtype (its state/
    rhs output dtypes are set by the state and olds_dtype), which
    changes the legal input_output_aliases pairings — see below.

    Axes 0/1: 3-stream roll-free windows (default bs=64, w=16).
    Axis 2: rolled 2-stream windows (default bs=128, w=64).

    With ab_olds=k (final sweep of an AB(k+1) scheme), the kernel also
    applies the Adams-Bashforth update in place: fn(u, v, w, acc, olds,
    dtc) -> ((u', v', w'), (rhs_u, rhs_v, rhs_w)) where `olds` is the
    flat (old_{j,c}) history, `dtc` the dt-scaled coefficient row, and
    the rhs outputs become the new olds[0]. This folds the separate
    15-pass AB elementwise update into the sweep (the mid blocks of
    u,v,w are already VMEM-resident)."""
    n = shape[axis]
    lane = axis == 2
    if bs is None:
        bs = 128 if lane else 64
    if w is None:
        # non-lane axes: K pads to 128 either way, so w only costs read
        # traffic (1.5x at 16, 2x at 32). bf16x6 mode earns the wider
        # band: truncation drops from 1.9e-7 to 3.8e-14, below its
        # matmul noise.
        w = 64 if lane else (32 if terms >= 3 else 16)
    nstream = 2 if lane else 3
    halo_ext = n_shards > 1
    if upd is None:
        upd = ab_olds > 0
    if (upd or ab_olds) and (lane or not accumulate or halo_ext):
        raise ValueError("fused-update sweeps must be non-lane "
                         "single-shard accumulate sweeps (mid blocks "
                         "must be resident)")
    if lane and 2 * w > bs:
        raise ValueError("lane axis needs w <= bs/2")
    if lane and halo_ext and 2 * w != bs:
        # the ext cover uses two aligned bs-blocks, so the halo must be
        # exactly bs/2 wide on the lane axis
        raise ValueError("sharded lane sweeps need w == bs/2")
    if not lane and bs % w:
        raise ValueError("3-stream windows need w | bs")
    if n % bs or (not halo_ext and n < bs + 2 * w):
        raise ValueError(f"n={n} not tileable with bs={bs}, w={w}")
    if halo_ext and ops_axis.der1st.n_in != n * n_shards:
        raise ValueError("local extent * n_shards must match the global "
                         "operator size")
    nb = n // bs

    d1, d1s = ops_axis.der1st, ops_axis.der1st_sym
    d2, d2s = ops_axis.der2nd, ops_axis.der2nd_sym
    sa = _stack_banded((d1, d2), w, bs)
    st = _stack_banded((d1s, d2s), w, bs)
    da = banded_blocks(d1s, w, bs, tol=_BAND_TOL)
    dt = banded_blocks(d1, w, bs, tol=_BAND_TOL)
    mats = []
    for M in (sa, st, da, dt):
        mats += [jnp.asarray(p) for p in split_hi_lo(M, terms)]

    xdiv = xdiv_mats is not None
    xmats = []
    if xdiv:
        # parity-split forward transforms (sx for u, ix for v/w), kept
        # fully VMEM-resident; TRANSPOSED so the kernel slices the
        # sublane dim (see _transeq_kernel_v3 xdiv)
        from .pallas_poisson import parity_split_folded
        if axis != 0 or not ab_olds or halo_ext:
            raise ValueError("xdiv fusion needs the single-shard "
                             "AB-fused axis-0 sweep")
        if n % (2 * bs):
            raise ValueError("xdiv fusion needs an even block count")
        for M64 in xdiv_mats:
            if M64.shape != (n, n):
                raise ValueError("xdiv transforms must be (n, n)")
            Me, Mo = parity_split_folded(np.asarray(M64, np.float64), 0)
            for Mp in (Me, Mo):
                xmats += [jnp.asarray(p)
                          for p in split_hi_lo(Mp.T, terms)]

    (grid, out_spec, fspecs, sspec, dspec, blk_of, map_of) = \
        _sweep_scaffold(axis, shape, free, n, nb, bs, w, lane, nstream,
                        halo_ext, n_shards)
    kern = functools.partial(_transeq_kernel_v3, axis=axis, nu=float(nu),
                             w=w, bs=bs, nstream=nstream,
                             accumulate=accumulate, terms=terms,
                             ab_olds=ab_olds, halo_ext=halo_ext,
                             xdiv=xdiv, nbh=nb // 2,
                             upd=upd, base_sep=base_sep)

    nparts = max(terms, 1)
    xspec = pl.BlockSpec((n // 2, n // 2), lambda i, j, b: (0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = ([out_spec] * 3 if accumulate else []) \
        + fspecs * 3 + [out_spec] * (3 * ab_olds) \
        + ([out_spec] * 3 if base_sep else []) \
        + [sspec] * (2 * nparts) + [dspec] * (2 * nparts) \
        + [xspec] * len(xmats)
    if halo_ext:
        in_specs = in_specs + [pl.BlockSpec((1,), lambda i, j, b: (0,),
                                            memory_space=pltpu.SMEM)]
    n_out = n_out_mom = (9 if xdiv else 6) if upd else 3
    if upd:
        # col 4 (present only with reduced history) carries the
        # error-feedback coefficient dt*future_coeff_sum
        _ncol = 5 if olds_dtype is not None else 4
        in_specs = in_specs + [pl.BlockSpec((1, _ncol),
                                            lambda i, j, b: (0, 0),
                                            memory_space=pltpu.SMEM)]
        # the accumulated partial rhs aliases onto the rhs outputs, and
        # the OLDEST history buffers (dropped by the rotation) onto the
        # updated velocities — the fused step then adds no peak HBM over
        # its inputs (blocks share the output index map, so in-place is
        # race-free like any elementwise aliasing). Alias pairs must
        # dtype-match, so the pairing depends on which streams are
        # reduced: acc dtype (acc_dtype or state) pairs with whichever
        # of u'(state dtype) / rhs(olds_dtype or state) it equals, and
        # the oldest old takes the other when its dtype fits; with acc
        # AND olds both bf16 the f32 u' has no matching operand left.
        acc_red = acc_dtype is not None
        olds_red = olds_dtype is not None
        if acc_red == olds_red:
            aliases = {0: 3, 1: 4, 2: 5}       # acc -> rhs (dtypes equal)
        elif olds_red:
            aliases = {0: 0, 1: 1, 2: 2}       # acc(f32) -> u'(f32)
        else:
            aliases = {}                       # acc bf16, rhs f32: none
        if ab_alias and ab_olds:
            first_old = 3 + 3 * nstream
            oldest = first_old + 3 * (ab_olds - 1)
            for c in range(3):
                if olds_red and not acc_red:
                    aliases[oldest + c] = 3 + c   # old(bf16)->rhs(bf16)
                elif not olds_red:
                    aliases[oldest + c] = c       # old(f32)->u'(f32)
                # acc_red and olds_red: rhs already taken by acc; u' is
                # f32 with no f32 same-map operand -> oldest unaliased
    elif accumulate:
        # in-place accumulation needs matching in/out dtypes; a final
        # sweep that reads reduced partials but emits state-precision
        # rhs (acc_out=False) cannot alias
        aliases = ({c: c for c in range(3)}
                   if (acc_dtype is None or acc_out) else {})
    else:
        aliases = {}

    def fn(u, v, w_, acc=None, olds=None, dtc=None, exts=None, off=None,
           base=None):
        if lane and not halo_ext:
            u, v, w_ = (jnp.roll(q, w, axis=axis) for q in (u, v, w_))
        field_args = []
        if halo_ext:
            # per field: l/r streams read the halo-extended operand
            for q, e in zip((u, v, w_), exts):
                field_args += [e] * 2 if lane else [e, q, e]
        else:
            for q in (u, v, w_):
                field_args += [q] * nstream
        args = list(acc) if accumulate else []
        args += field_args
        if ab_olds:
            # olds: per-field (nolds,) history tuples -> flat j-major
            args += [olds[c][j] for j in range(ab_olds) for c in range(3)]
        if base_sep:
            args += list(base)
        args += mats + xmats
        if halo_ext:
            args += [jnp.reshape(off, (1,)).astype(jnp.int32)]
        if upd:
            row = jnp.reshape(dtc, (1, -1)).astype(u.dtype)
            if olds_dtype is not None and row.shape[1] != 5:
                raise ValueError(
                    "reduced-history sweeps need a 5-column dtc row "
                    "(cols 0..3 AB coefficients, col 4 = dt*"
                    "future_coeff_sum error-feedback)")
            args += [row]
        out_shape = [jax.ShapeDtypeStruct(shape, u.dtype)] * n_out
        if not upd and acc_dtype is not None and acc_out:
            # intermediate sweep: the outputs ARE the partial streams
            out_shape = [jax.ShapeDtypeStruct(shape, acc_dtype)] * n_out
        if upd and olds_dtype is not None:
            # the rhs outputs ARE the next step's olds[0]: store them at
            # the history precision so the 3 writes (and next step's 3
            # reads per history slot) move half the bytes
            out_shape[3:6] = [jax.ShapeDtypeStruct(shape, olds_dtype)] * 3
        # xdiv: b-revisited full-extent div output blocks (written once)
        out_specs = [out_spec] * min(n_out_mom, 6) \
            + [pl.BlockSpec(blk_of(n), map_of(lambda b: 0),
                            memory_space=pltpu.VMEM)] * (n_out_mom - 6)
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            scratch_shapes=([pltpu.VMEM(blk_of(n), jnp.float32)] * 3
                            if xdiv else []),
            interpret=interpret,
            # the xdiv scratch accumulators push the kernel past the
            # 64 MB scoped cap at 512^3 (66.2 MB; chip takes ~72)
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=70 * 2**20) if xdiv else _cparams(3)),
        )(*args)
        if xdiv:
            return (tuple(outs[:3]), tuple(outs[3:6]), tuple(outs[6:9]))
        if upd:
            return (tuple(outs[:3]), tuple(outs[3:6]))
        return outs

    return fn


def _pencil_kernel(*refs, axis, nu, w, bs, nb, terms, accumulate):
    """Full-sweep-axis pencil kernel: refs are [acc pencils]? +
    pencils of u, v, w (full extent along `axis`) +
    matrix stacks + 3 outputs.
    Each field is read from HBM exactly ONCE per sweep (the streamed
    window covers re-fetch overlapping blocks; the lane axis previously
    also paid a roll pre-pass): the pencil is halo-extended by concat in
    VMEM, split into bf16 parts once, and all nb output blocks are
    computed from aligned slices of the extended parts."""
    i = 0
    accs = None
    if accumulate:
        accs = refs[:3]
        i = 3
    u_ref, v_ref, w_ref = refs[i:i + 3]
    i += 3
    nparts = max(terms, 1)
    m = refs[i:i + 4 * nparts]
    sa, st = m[:nparts], m[nparts:2 * nparts]
    da, dt = m[2 * nparts:3 * nparts], m[3 * nparts:4 * nparts]
    outs = refs[i + 4 * nparts:]
    prec = (jax.lax.Precision.HIGHEST if terms == 0
            else jax.lax.Precision.DEFAULT)

    def asl(lo, hi):
        s = [slice(None)] * 3
        s[axis] = slice(lo, hi)
        return tuple(s)

    comps = [r[...] for r in (u_ref, v_ref, w_ref)]
    conv_full = comps[axis]
    n = conv_full.shape[axis]

    def extend(q):
        return jnp.concatenate([q[asl(n - w, n)], q, q[asl(0, w)]],
                               axis=axis)

    conv_ext = extend(conv_full)
    exts, pexts = [], []
    for q in comps:
        e = extend(q)
        exts.append(_split(e, terms))
        pexts.append(_split(e * conv_ext, terms))

    for b in range(nb):
        sl = asl(b * bs, b * bs + bs + 2 * w)
        out_sl = asl(b * bs, (b + 1) * bs)
        conv = conv_full[out_sl]
        for c in range(3):
            qs = tuple(x[sl] for x in exts[c])
            ps = tuple(x[sl] for x in pexts[c])
            S, D = (sa, da) if c == axis else (st, dt)
            Sb = tuple(M[b] for M in S)
            Db = tuple(M[b] for M in D)
            stacked = _contract_split(Sb, qs, axis, prec)
            dq = stacked[asl(0, bs)]
            d2q = stacked[asl(bs, 2 * bs)]
            dqd = _contract_split(Db, ps, axis, prec)
            r = -0.5 * (conv * dq + dqd) + nu * d2q
            if accumulate:
                r = r + accs[c][out_sl]
            outs[c][out_sl] = r.astype(outs[c].dtype)


def make_pencil_sweep(ops_axis, nu, axis, shape, free=None, w=None,
                      bs=None, interpret=False, terms=2,
                      accumulate=False, acc_dtype=None):
    """Single-read direction sweep: fn(u, v, w[, acc]) -> (du, dv, dw).
    The sweep axis stays fully VMEM-resident per grid step (enabled by
    the raised VMEM_LIMIT); drop-in replacement for the windowed-stream
    sweeps with ~1.5-2.5x less HBM read traffic. acc_dtype sets the
    partial-stream output dtype (see make_transeq_dir_v3)."""
    lane = axis == 2
    if bs is None:
        bs = 128 if lane else 64
    if w is None:
        w = 64 if lane else (32 if terms >= 3 else 16)
    if free is None:
        free = {0: (8, 128), 1: (8, 128), 2: (4, 64)}[axis]
    n = shape[axis]
    other = [a for a in range(3) if a != axis]
    t0, t1 = free
    if n % bs or shape[other[0]] % t0 or shape[other[1]] % t1:
        raise ValueError(f"shape {shape} not tileable for pencil sweep")
    nb = n // bs

    d1, d1s = ops_axis.der1st, ops_axis.der1st_sym
    d2, d2s = ops_axis.der2nd, ops_axis.der2nd_sym
    sa = _stack_banded((d1, d2), w, bs)
    st = _stack_banded((d1s, d2s), w, bs)
    da = banded_blocks(d1s, w, bs, tol=_BAND_TOL)
    dt = banded_blocks(d1, w, bs, tol=_BAND_TOL)
    mats = []
    for M in (sa, st, da, dt):
        mats += [jnp.asarray(p) for p in split_hi_lo(M, terms)]

    blk = [0, 0, 0]
    blk[axis] = n
    blk[other[0]] = t0
    blk[other[1]] = t1

    def pmap(i, j):
        idx = [0, 0, 0]
        idx[other[0]] = i
        idx[other[1]] = j
        return tuple(idx)

    pencil = pl.BlockSpec(tuple(blk), pmap, memory_space=pltpu.VMEM)
    nparts = max(terms, 1)
    win = bs + 2 * w
    sspec = pl.BlockSpec((nb, 2 * bs, win), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((nb, bs, win), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_pencil_kernel, axis=axis, nu=float(nu), w=w,
                             bs=bs, nb=nb, terms=terms,
                             accumulate=accumulate)
    grid = (shape[other[0]] // t0, shape[other[1]] // t1)
    aliases = ({c: c for c in range(3)} if accumulate else {})

    def fn(u, v, w_, acc=None):
        args = list(acc) if accumulate else []
        args += [u, v, w_] + mats
        out_shape = [jax.ShapeDtypeStruct(shape, acc_dtype or u.dtype)] * 3
        outs = pl.pallas_call(
            kern, grid=grid,
            in_specs=([pencil] * 3 if accumulate else [])
            + [pencil] * 3 + [sspec] * (2 * nparts)
            + [dspec] * (2 * nparts),
            out_specs=[pencil] * 3,
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=_cparams(2),
        )(*args)
        return outs

    return fn


def make_fused_transeq_v3(solver_ops, nu, shape, cfgs=None, interpret=False,
                          terms=2, acc_dtype=None):
    """Full transeq: three accumulated direction sweeps.
    fn(u, v, w) -> (du, dv, dw) summed over directions.
    terms=2 -> bf16x3 (Precision.HIGH); terms=3 -> bf16x6 (HIGHEST, the
    KE-parity mode, ~2x the matmul cost). acc_dtype reduces the two
    INTERMEDIATE partial streams (d2->d0, d0->d1); the final d1 output
    stays at state precision for downstream consumers."""
    cfgs = cfgs or {}
    d2 = _make_sweep(solver_ops[2], nu, 2, shape, terms, interpret,
                     cfgs.get(2, {}), acc_dtype=acc_dtype)
    d0 = _make_sweep(solver_ops[0], nu, 0, shape, terms, interpret,
                     cfgs.get(0, {}), accumulate=True,
                     acc_dtype=acc_dtype)
    d1 = make_transeq_dir_v3(solver_ops[1], nu, 1, shape, terms=terms,
                             accumulate=True, interpret=interpret,
                             acc_dtype=acc_dtype, acc_out=False,
                             **cfgs.get(1, {}))

    def fn(u, v, w):
        acc = d2(u, v, w)
        acc = d0(u, v, w, acc=acc)
        acc = d1(u, v, w, acc=acc)
        return acc

    return fn


def _make_sweep(ops_axis, nu, axis, shape, terms, interpret, cfg,
                accumulate=False, ab_olds=0, acc_dtype=None):
    """One direction sweep: the single-read pencil kernel on the lane
    axis (16.1 vs 18.0 ms at 512^3 — it also replaces the roll
    pre-pass), else the windowed-stream variant. Non-lane pencils were
    MEASURED SLOWER (512^3 step 85.3 vs 82.0 ms with a pencil d0: the
    3-stream windows' small halo fetches beat holding the full sweep
    axis resident), and the AB-fused final sweep needs per-block history
    operands."""
    if axis == 2 and not cfg and not ab_olds:
        try:
            return make_pencil_sweep(ops_axis, nu, axis, shape,
                                     interpret=interpret, terms=terms,
                                     accumulate=accumulate,
                                     acc_dtype=acc_dtype)
        except ValueError:
            pass
    return make_transeq_dir_v3(ops_axis, nu, axis, shape, terms=terms,
                               accumulate=accumulate, ab_olds=ab_olds,
                               interpret=interpret, acc_dtype=acc_dtype,
                               **cfg)


def make_fused_transeq_ab_v3(solver_ops, nu, shape, nolds, cfgs=None,
                             interpret=False, terms=2, xdiv=None,
                             skip_d2=False, olds_dtype=None,
                             acc_dtype=None):
    """Transeq + Adams-Bashforth update in one fused chain:
    fn(u, v, w, olds, dtc) -> ((u', v', w'), (rhs_u, rhs_v, rhs_w)).

    With skip_d2 (the d2-in-C projection carry, pallas_poisson
    _pipe_c_kernel d2=True), the z sweep is NOT run here: fn gains a
    required `acc0` argument — the z-direction RHS partials emitted by
    the PREVIOUS step's projection kernel on the same velocities — and
    the chain starts at the accumulated d0 sweep.

    The final (axis 1) sweep applies the AB update in-kernel while the
    u,v,w mid blocks are VMEM-resident, replacing the separate
    12-read/3-write elementwise AB pass (time_integrators.ab_step) with
    6 extra in-kernel block reads and 3 writes. `olds` is the per-field
    history tuple structure of ab_step; `dtc` the dt-scaled coefficient
    row (traced, so AB startup steps reuse the same program). The rhs
    outputs are the new olds[0]; rotation stays a tuple reshuffle.

    With xdiv=(sx64, ix64) (the projection's transform-folded x-stage
    divergence matrices, periodic-even x) the chain reorders to
    d2 -> d1 -> d0 with the FINAL sweep the AB-fused axis-0 windowed
    sweep, which ALSO emits the x-transformed divergence inputs
    (see _transeq_kernel_v3 xdiv): fn(...) -> ((u', v', w'), rhs,
    (du, dv, dw)), and the projection's three x-div kernels (and their
    full-field re-reads) vanish. Raises ValueError when the shapes or
    the parity symmetry do not allow it."""
    cfgs = cfgs or {}
    if skip_d2 and acc_dtype is not None:
        # the d2-in-C carry's acc0 comes from the projection's kernel C
        # at state precision; reduced partials would need that kernel
        # to emit bf16 too — not wired (both paths are opt-in)
        raise ValueError("skip_d2 and acc_dtype are exclusive")
    d2 = None if skip_d2 else _make_sweep(solver_ops[2], nu, 2, shape,
                                          terms, interpret,
                                          cfgs.get(2, {}),
                                          acc_dtype=acc_dtype)
    if xdiv is not None:
        if skip_d2:
            raise ValueError("skip_d2 and xdiv are exclusive chains")
        d0x = make_transeq_dir_v3(solver_ops[0], nu, 0, shape,
                                  terms=terms, accumulate=True,
                                  ab_olds=nolds, interpret=interpret,
                                  xdiv_mats=xdiv, olds_dtype=olds_dtype,
                                  acc_dtype=acc_dtype,
                                  **cfgs.get(0, {}))
        d1p = _make_sweep(solver_ops[1], nu, 1, shape, terms, interpret,
                          cfgs.get(1, {}), accumulate=True,
                          acc_dtype=acc_dtype)

        def fnx(u, v, w, olds, dtc):
            acc = d2(u, v, w)
            acc = d1p(u, v, w, acc=acc)
            return d0x(u, v, w, acc=acc, olds=olds, dtc=dtc)

        return fnx
    d0 = _make_sweep(solver_ops[0], nu, 0, shape, terms, interpret,
                     cfgs.get(0, {}), accumulate=True,
                     acc_dtype=acc_dtype)
    d1 = make_transeq_dir_v3(solver_ops[1], nu, 1, shape, terms=terms,
                             accumulate=True, ab_olds=nolds,
                             interpret=interpret, olds_dtype=olds_dtype,
                             acc_dtype=acc_dtype,
                             **cfgs.get(1, {}))

    if skip_d2:
        def fns(u, v, w, olds, dtc, acc0):
            acc = d0(u, v, w, acc=tuple(acc0))
            return d1(u, v, w, acc=acc, olds=olds, dtc=dtc)

        return fns

    def fn(u, v, w, olds, dtc):
        acc = d2(u, v, w)
        acc = d0(u, v, w, acc=acc)
        return d1(u, v, w, acc=acc, olds=olds, dtc=dtc)

    return fn


def make_fused_transeq_rk(solver_ops, nu, shape, order, cfgs=None,
                          interpret=False, terms=2):
    """Transeq + Runge-Kutta substage update in one fused chain
    (time_integrator.f90:166-231): returns a list of per-substage
    functions

        stage_fns[i](u, v, w, f0, ks, dtc) -> ((u', v', w'), rhs)

    where u,v,w are the substage-entry velocities, f0 the step-initial
    fields (ignored at substage 0, whose base IS the entry field), ks
    the previous stage derivatives that carry a NONZERO coefficient in
    this substage's tableau row, and dtc the dt-scaled coefficient row
    [fresh, ks...] (padded to 4). rhs is this substage's derivative
    (needed by later substages; callers may drop the last one).

    The classic RK1-4 tableaus (time_integrators.RK_A/RK_B) have at
    most the FINAL substage reading history (all earlier rows touch
    only the fresh derivative), so the non-final variants compile to
    the ab_olds=0 fused-update sweep."""
    from ..time_integrators import RK_A, RK_B
    cfgs = cfgs or {}
    d2 = _make_sweep(solver_ops[2], nu, 2, shape, terms, interpret,
                     cfgs.get(2, {}))
    d0 = _make_sweep(solver_ops[0], nu, 0, shape, terms, interpret,
                     cfgs.get(0, {}), accumulate=True)

    stage_fns = []
    for istage in range(order):
        last = istage == order - 1
        tab = (RK_B[order] if last else RK_A[order][istage])
        prev_nz = [j for j in range(istage) if tab[j] != 0.0]
        if tab[istage] == 0.0:
            raise ValueError("fused RK needs a nonzero fresh coefficient")
        d1 = make_transeq_dir_v3(
            solver_ops[1], nu, 1, shape, terms=terms, accumulate=True,
            ab_olds=len(prev_nz), upd=True, base_sep=istage > 0,
            ab_alias=False, interpret=interpret, **cfgs.get(1, {}))

        def stage(u, v, w, f0, ks, dtc, d1=d1, prev_nz=prev_nz,
                  istage=istage):
            acc = d2(u, v, w)
            acc = d0(u, v, w, acc=acc)
            # per-field history tuples: olds[c][j] = ks[prev_nz[j]][c]
            olds = tuple(tuple(ks[j][c] for j in prev_nz)
                         for c in range(3))
            return d1(u, v, w, acc=acc, olds=olds, dtc=dtc,
                      base=(None if istage == 0 else f0))

        stage.prev_nz = prev_nz
        stage.fresh_coeff = float(tab[istage])
        stage_fns.append(stage)
    return stage_fns


def transeq_v3_supported(solver, shape) -> bool:
    """Uniform mesh, square ops, extents tileable per-axis (v3 defaults)."""
    for axis in range(3):
        o = solver.ops[axis]
        corr = o.der2nd.stretch_correct
        if corr is not None and np.any(corr):
            return False
        n = shape[axis]
        lane = axis == 2
        bs = 128 if lane else 64
        w = 64 if lane else 16
        if n % bs or n < bs + 2 * w:
            return False
        other = [a for a in range(3) if a != axis]
        t0, t1 = _free_dims(axis)
        if shape[other[0]] % t0 or shape[other[1]] % t1:
            return False
        if o.der1st.n_out != n or o.der1st.n_in != n:
            return False
        try:
            for op in (o.der1st, o.der1st_sym, o.der2nd, o.der2nd_sym):
                banded_blocks(op, w, bs, tol=_BAND_TOL)
        except ValueError:
            return False
    return True


# ---------------------------------------------------------------------------
# Species (scalar transport) v3 sweeps.
#
# Reference transeq_species (solver.f90:507-601, omp/backend.f90:226-231):
# every species' RHS along a direction uses the ALIGNED operator pairing
# (der1st for dphi, der1st_sym for d(phi*conv), der2nd for d2phi) against
# the axis-aligned velocity component. One kernel handles ALL species per
# direction so the conv window is read from HBM once, and the accumulator
# aliasing chains the three direction sweeps with no extra passes — the
# einsum path costs 9 dense applies per species per step.
# ---------------------------------------------------------------------------


def _species_kernel_v3(*refs, axis, nus, w, bs, nstream, accumulate,
                       terms, halo_ext=False):
    """refs: [acc_s]*nsp? + conv stream blocks + per-species phi stream
    blocks + matrix refs (nparts stacked-(d1,d2) parts + nparts banded
    d1s parts) [+ SMEM shard offset] + nsp outputs. `nus` (per-species
    diffusivities) are baked Python floats — the species loop is
    unrolled."""
    nsp = len(nus)
    i = 0
    accs = None
    if accumulate:
        accs = refs[:nsp]
        i = nsp
    conv_parts = refs[i:i + nstream]
    i += nstream
    phis = []
    for _ in range(nsp):
        phis.append(refs[i:i + nstream])
        i += nstream
    nparts = max(terms, 1)
    mat_refs = refs[i:i + 2 * nparts]
    i += 2 * nparts
    off_ref = None
    if halo_ext:
        off_ref = refs[i]
        i += 1
    outs = refs[i:]
    b = pl.program_id(2)
    if halo_ext:
        # matrix stacks hold the GLOBAL banded blocks: index at the
        # shard's block offset so BC closure rows land on the right shard
        b = b + off_ref[0]

    def window(parts):
        if nstream == 2:
            a_ref, b_ref = parts
            sl = [slice(None)] * 3
            sl[axis] = slice(0, 2 * w)
            return jnp.concatenate([a_ref[...], b_ref[tuple(sl)]],
                                   axis=axis), None
        l_ref, m_ref, r_ref = parts
        mid = m_ref[...]
        return jnp.concatenate([l_ref[...], mid, r_ref[...]],
                               axis=axis), mid

    convw, convmid = window(conv_parts)
    if nstream == 2:
        sl = [slice(None)] * 3
        sl[axis] = slice(w, w + bs)
        conv = convw[tuple(sl)]
    else:
        conv = convmid
    sa = tuple(m[b] for m in mat_refs[:nparts])
    ds = tuple(m[b] for m in mat_refs[nparts:])
    prec = (jax.lax.Precision.HIGHEST if terms == 0
            else jax.lax.Precision.DEFAULT)
    sl1 = [slice(None)] * 3
    sl1[axis] = slice(0, bs)
    sl2 = [slice(None)] * 3
    sl2[axis] = slice(bs, 2 * bs)
    for s in range(nsp):
        q, _ = window(phis[s])
        qs = _split(q, terms)
        ps = _split(q * convw, terms)
        stacked = _contract_split(sa, qs, axis, prec)
        dq = stacked[tuple(sl1)]
        d2q = stacked[tuple(sl2)]
        dqd = _contract_split(ds, ps, axis, prec)
        r = -0.5 * (conv * dq + dqd) + nus[s] * d2q
        if accumulate:
            r = r + accs[s][...]
        outs[s][...] = r.astype(outs[s].dtype)


def make_species_dir_v3(ops_axis, nus, axis, shape, w=None, bs=None,
                        free=None, accumulate=False, interpret=False,
                        terms=2, n_shards=1):
    """One species direction sweep: fn(phis, conv[, acc]) -> rhs tuple.
    `phis` is a tuple of (nx,ny,nz) scalar fields, `conv` the velocity
    component aligned with `axis`. Same tiling/stream layout as
    make_transeq_dir_v3; with n_shards > 1 the sweep runs in halo-ext
    mode (fn takes exts=(conv_ext, *phi_exts) and the shard block
    offset, like the sharded momentum sweeps)."""
    n = shape[axis]
    lane = axis == 2
    nsp = len(nus)
    if not nsp:
        raise ValueError("no species")
    if nsp > 8:
        raise ValueError("species kernel capped at 8 per call (VMEM)")
    if bs is None:
        bs = 128 if lane else 64
    if w is None:
        w = 64 if lane else (32 if terms >= 3 else 16)
    nstream = 2 if lane else 3
    halo_ext = n_shards > 1
    if lane and 2 * w > bs:
        raise ValueError("lane axis needs w <= bs/2")
    if lane and halo_ext and 2 * w != bs:
        raise ValueError("sharded lane sweeps need w == bs/2")
    if not lane and bs % w:
        raise ValueError("3-stream windows need w | bs")
    if n % bs or (not halo_ext and n < bs + 2 * w):
        raise ValueError(f"n={n} not tileable with bs={bs}, w={w}")
    if halo_ext and ops_axis.der1st.n_in != n * n_shards:
        raise ValueError("local extent * n_shards must match the global "
                         "operator size")
    nb = n // bs

    d1, d1s = ops_axis.der1st, ops_axis.der1st_sym
    sa = _stack_banded((d1, ops_axis.der2nd), w, bs)
    ds = banded_blocks(d1s, w, bs, tol=_BAND_TOL)
    mats = []
    for M in (sa, ds):
        mats += [jnp.asarray(p) for p in split_hi_lo(M, terms)]

    (grid, out_spec, fspecs, sspec, dspec, blk_of, map_of) = \
        _sweep_scaffold(axis, shape, free, n, nb, bs, w, lane, nstream,
                        halo_ext, n_shards)
    nparts = max(terms, 1)
    kern = functools.partial(_species_kernel_v3, axis=axis,
                             nus=tuple(float(x) for x in nus), w=w, bs=bs,
                             nstream=nstream, accumulate=accumulate,
                             terms=terms, halo_ext=halo_ext)
    in_specs = ([out_spec] * nsp if accumulate else []) \
        + fspecs + fspecs * nsp \
        + [sspec] * nparts + [dspec] * nparts
    if halo_ext:
        in_specs = in_specs + [pl.BlockSpec((1,), lambda i, j, b: (0,),
                                            memory_space=pltpu.SMEM)]
    aliases = {s: s for s in range(nsp)} if accumulate else {}

    def fn(phis, conv, acc=None, exts=None, off=None):
        if halo_ext:
            # exts = (conv_ext, *phi_exts): l/r streams read the
            # halo-extended operands
            if lane:
                field_args = [exts[0]] * 2
                for e in exts[1:]:
                    field_args += [e] * 2
            else:
                field_args = [exts[0], conv, exts[0]]
                for q, e in zip(phis, exts[1:]):
                    field_args += [e, q, e]
        else:
            if lane:
                conv = jnp.roll(conv, w, axis=axis)
                phis = tuple(jnp.roll(q, w, axis=axis) for q in phis)
            field_args = [conv] * nstream
            for q in phis:
                field_args += [q] * nstream
        args = (list(acc) if accumulate else []) + field_args + mats
        if halo_ext:
            args += [jnp.reshape(off, (1,)).astype(jnp.int32)]
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=[out_spec] * nsp,
            out_shape=[jax.ShapeDtypeStruct(shape, phis[0].dtype)] * nsp,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=_cparams(3),
        )(*args)
        # out_shape is a list, so pallas_call returns a list even for one
        # species
        return tuple(outs)

    return fn


def make_fused_species_v3(solver_ops, nus, shape, interpret=False,
                          terms=2):
    """Full species transeq: three accumulated direction sweeps sharing
    the conv window reads across species.
    fn(phis, u, v, w) -> per-species rhs tuple."""
    d2 = make_species_dir_v3(solver_ops[2], nus, 2, shape, terms=terms,
                             interpret=interpret)
    d0 = make_species_dir_v3(solver_ops[0], nus, 0, shape, terms=terms,
                             accumulate=True, interpret=interpret)
    d1 = make_species_dir_v3(solver_ops[1], nus, 1, shape, terms=terms,
                             accumulate=True, interpret=interpret)

    def fn(phis, u, v, w):
        phis = tuple(phis)
        acc = d2(phis, w)
        acc = d0(phis, u, acc=acc)
        return d1(phis, v, acc=acc)

    return fn
