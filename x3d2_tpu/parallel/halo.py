"""Halo-exchange application of compact operators over a sharded axis.

The explicit TPU analogue of the reference's DistD2 distributed
tridiagonal algorithm (src/backend/omp/exec_dist.f90, theory.rst:386-416,
arXiv:2411.13532): instead of each shard solving locally and exchanging a
2x2 reduced interface system, we exploit the same diagonal-dominance
property directly -- the resolved operator matrix M = A^-1 B decays
exponentially off the diagonal, so each shard only needs a halo of `w`
neighbour planes (w chosen so dropped entries are below the compute
precision; w=32 gives ~1e-16 for the compact6 first derivative, matching
the reference's own >=20-points-per-rank truncation assumption,
tdsops.f90:196-201).

Mechanics per shard (inside shard_map):
  halo = ppermute of w edge planes from prev/next neighbours (the
  reference's sendrecv_fields, omp/sendrecv.f90:10-36)
  out  = M_rows[shard] @ concat(prev_halo, local, next_halo)
with the per-shard row blocks of the *global* float64 operator sliced at
setup, so the result is exact (up to truncation below epsilon) and
identical to the unsharded dense apply.

This is the comm-optimal alternative to letting GSPMD reduce-scatter full
partial products; the default jit path remains GSPMD (parallel/topo.py),
with this module providing the explicit-collective fast path and the
parity demonstration tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from ..ops.compact import CompactOp, PRECISION


def shard_operator_blocks(op: CompactOp, n_shards: int, w: int = 32,
                          dtype=None):
    """Slice the global operator into per-shard row blocks with halo
    columns: returns (n_shards, rows, local+2w) with periodic wrap or zero
    padding at global boundaries."""
    M = op.M64
    n_out, n_in = M.shape
    if n_out % n_shards or n_in % n_shards:
        raise ValueError("operator dims must divide the shard count")
    ro = n_out // n_shards
    ci = n_in // n_shards
    blocks = np.zeros((n_shards, ro, ci + 2 * w))
    dropped = 0.0
    for s in range(n_shards):
        rows = M[s * ro:(s + 1) * ro]
        cols = np.arange(s * ci - w, (s + 1) * ci + w)
        if op.periodic:
            gcols = cols % n_in
            blk = rows[:, gcols].copy()
            # wide windows (n_loc + 2w > n_global) wrap past the whole
            # domain: a global column then appears at SEVERAL window
            # positions, and keeping the entry at each would double-count
            # it in the apply (measured 2.6e-7 transeq error at f64
            # w=48 with n_loc=64 before this fix; O(1) at w=64). Keep
            # each entry at its first occurrence only — the ext operand
            # carries identical values at the duplicates, so the apply
            # is exact either way.
            seen = set()
            for j, g in enumerate(gcols):
                if g in seen:
                    blk[:, j] = 0.0
                else:
                    seen.add(g)
            blocks[s] = blk
            # account for entries outside the halo window (truncated)
            mask = np.ones(n_in, bool)
            mask[gcols] = False
            dropped = max(dropped, np.abs(rows[:, mask]).max(initial=0.0))
        else:
            valid = (cols >= 0) & (cols < n_in)
            blocks[s][:, valid] = rows[:, cols[valid]]
            mask = np.ones(n_in, bool)
            mask[cols[valid]] = False
            dropped = max(dropped, np.abs(rows[:, mask]).max(initial=0.0))
    scale = np.abs(M).max()
    if dropped > 1e-7 * scale:
        raise ValueError(
            f"halo width {w} too small: truncated operator entries at "
            f"{dropped / scale:.2e} of max (increase w)")
    dtype = dtype or op.M.dtype
    return jnp.asarray(blocks, dtype=dtype), dropped / scale


def make_halo_apply(op: CompactOp, dmesh: DeviceMesh, mesh_axis: str,
                    spatial_axis: int, w: int = 32, field_spec: P = None):
    """Build fn(f) applying `op` along a sharded spatial axis via
    ppermute halo exchange inside shard_map. `field_spec` is the full
    PartitionSpec of f (other axes may also be sharded; the local apply
    does not touch them); defaults to sharding only spatial_axis."""
    n_shards = dmesh.shape[mesh_axis]
    blocks, trunc = shard_operator_blocks(op, n_shards, w)
    ns = n_shards

    if field_spec is None:
        spec_in = [None, None, None]
        spec_in[spatial_axis] = mesh_axis
        field_spec = P(*spec_in)
    fspec = field_spec
    bspec = P(mesh_axis)  # blocks sharded over their leading axis

    fwd = [(i, (i + 1) % ns) for i in range(ns)]
    bwd = [(i, (i - 1) % ns) for i in range(ns)]

    def local_fn(blk, f):
        # f: local shard (full x, local y/z ...); blk: (1, ro, ci+2w)
        blk = blk[0]
        ax = spatial_axis
        n_loc = f.shape[ax]
        lo = jax.lax.slice_in_dim(f, 0, w, 1, ax)
        hi = jax.lax.slice_in_dim(f, n_loc - w, n_loc, 1, ax)
        # prev-neighbour's top edge arrives as our left halo
        left = jax.lax.ppermute(hi, mesh_axis, fwd)
        right = jax.lax.ppermute(lo, mesh_axis, bwd)
        fext = jnp.concatenate([left, f, right], axis=ax)
        sub = ["iyz->ayz", "xiz->xaz", "xyi->xya"][ax]
        return jnp.einsum("ai," + sub, blk, fext, precision=PRECISION)

    shard_fn = jax.shard_map(local_fn, mesh=dmesh,
                             in_specs=(bspec, fspec), out_specs=fspec)
    return lambda f: shard_fn(blocks, f)


def halo_apply(op: CompactOp, f, dmesh: DeviceMesh, mesh_axis: str,
               spatial_axis: int, w: int = 32):
    return make_halo_apply(op, dmesh, mesh_axis, spatial_axis, w)(f)


# ---------------------------------------------------------------------------
# Production integration: halo-wrapped operator bundles.
# ---------------------------------------------------------------------------


def halo_width(dtype) -> int:
    """Band half-width for exact-to-epsilon truncation: the slowest
    compact6 decay (der1st, alpha=1/3, rate ~0.382/point) reaches
    ~4e-21 at w=48 (f64 grade) and ~4e-14 at w=32 (f32 grade)."""
    import jax.numpy as jnp
    return 48 if dtype == jnp.float64 else 32


class HaloCompactOp:
    """CompactOp wrapper routing the apply along one sharded spatial axis
    through ppermute halo exchange (the production use of the DistD2
    analogue, reference src/backend/omp/exec_dist.f90:16-65). Duck-types
    CompactOp for the solver's call sites."""

    def __init__(self, op: CompactOp, dmesh, mesh_axis, spatial_axis,
                 w, field_spec=None):
        self._op = op
        self.spatial_axis = spatial_axis
        self._fn = make_halo_apply(op, dmesh, mesh_axis, spatial_axis, w,
                                   field_spec=field_spec)

    def __getattr__(self, name):
        return getattr(self._op, name)

    def __call__(self, f, axis):
        if axis != self.spatial_axis:
            raise ValueError(
                f"halo op built for axis {self.spatial_axis}, got {axis}")
        return self._fn(f)


_OP_NAMES = ("der1st", "der1st_sym", "der2nd", "der2nd_sym",
             "stagder_v2p", "interpl_v2p", "stagder_p2v", "interpl_p2v")


class _HaloBundle:
    """AxisOps look-alike with halo-wrapped operators."""

    def __init__(self, axis):
        self.axis = axis


def make_halo_axis_ops(axis_ops, dmesh, mesh_axis, spatial_axis, w,
                       field_spec=None):
    """Wrap every square operator of one AxisOps bundle with halo
    applies. Non-square ops (staggered grids under Dirichlet, where
    vertex/cell counts differ) stay on the GSPMD path — those axes are
    not shardable by field_spec anyway (odd extents)."""

    def wrap(op):
        if op.n_out != op.n_in:
            return op
        return HaloCompactOp(op, dmesh, mesh_axis, spatial_axis, w,
                             field_spec=field_spec)

    b = _HaloBundle(axis_ops.axis)
    for name in _OP_NAMES:
        setattr(b, name, wrap(getattr(axis_ops, name)))
    return b
