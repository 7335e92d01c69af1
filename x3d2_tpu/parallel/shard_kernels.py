"""Sharded v3 Pallas transeq: per-shard fused kernels + ppermute halos.

Multi-chip production path for the fused transeq sweeps: each device runs
the single-chip v3 banded kernels (ops/pallas_kernels.py) on its local
shard, with the sweep windows that cross shard edges fed from halo planes
exchanged over ICI by lax.ppermute — the kernel-level analogue of the
reference's DistD2 + fused CUDA kernels pipeline
(src/backend/cuda/kernels/distributed.f90:196-685 fused transeq over
locally-owned pencils, src/backend/omp/sendrecv.f90:10-36 halo exchange).

Mechanics per direction sweep along a sharded axis:
  1. exchange w edge planes with both neighbours (w = the kernel's banded
     window half-width: 16 planes for bf16x3 sweeps, 64 on the lane axis
     — far below DistD2's per-solve interface traffic),
  2. run the v3 kernel in halo-ext mode: l/r stream blocks read from the
     extended operand, and the banded matrix stacks hold the GLOBAL
     operator blocks indexed at (shard offset + local block), so BC
     closure rows land on the right shard and the result equals the
     unsharded kernel exactly.

Unsharded axes (x always; y/z when the mesh dimension is 1) run the
plain single-chip kernels. The whole three-sweep chain lives inside one
shard_map, so XLA sees only ppermutes — no all-gathers.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from ..common import DataLoc
from ..ops.pallas_kernels import (_BAND_TOL, _free_dims, banded_blocks,
                                  make_transeq_dir_v3)
from .topo import field_spec

_MESH_AXIS = {1: "y", 2: "z"}


def _axis_shards(solver, dmesh):
    """Per spatial axis: (n_shards, mesh-axis name or None)."""
    dims = solver.mesh.dims(DataLoc.VERT)
    spec = tuple(field_spec(dmesh, dims))
    out = []
    for axis in range(3):
        name = spec[axis]
        out.append((dmesh.shape[name] if name else 1, name))
    return out, dims


def _halo_w(axis, terms):
    return 64 if axis == 2 else (32 if terms >= 3 else 16)


def sharded_transeq_v3_supported(solver, dmesh, terms=2) -> bool:
    """Local shard extents tileable by the v3 block sizes; square uniform
    operators whose banded truncation passes at the kernel band width."""
    shards, dims = _axis_shards(solver, dmesh)
    local = tuple(dims[a] // shards[a][0] for a in range(3))
    for axis in range(3):
        o = solver.ops[axis]
        corr = o.der2nd.stretch_correct
        if corr is not None and np.any(corr):
            return False
        if o.der1st.n_out != dims[axis] or o.der1st.n_in != dims[axis]:
            return False
        ns, _ = shards[axis]
        if dims[axis] % ns:
            return False
        n = local[axis]
        lane = axis == 2
        bs = 128 if lane else 64
        w = _halo_w(axis, terms)
        if n % bs or (ns == 1 and n < bs + 2 * w):
            return False
        other = [a for a in range(3) if a != axis]
        t0, t1 = _free_dims(axis)
        if local[other[0]] % t0 or local[other[1]] % t1:
            return False
        try:
            for op in (o.der1st, o.der1st_sym, o.der2nd, o.der2nd_sym):
                banded_blocks(op, w, bs, tol=_BAND_TOL)
        except ValueError:
            return False
    return True


def _exchange_halo(fields, axis, name, ns, wa, n_loc):
    """Halo-extend each field along `axis` via neighbour ppermute."""
    fwd = [(i, (i + 1) % ns) for i in range(ns)]
    bwd = [(i, (i - 1) % ns) for i in range(ns)]
    outs = []
    for q in fields:
        lo = jax.lax.slice_in_dim(q, 0, wa, 1, axis)
        hi = jax.lax.slice_in_dim(q, n_loc - wa, n_loc, 1, axis)
        left = jax.lax.ppermute(hi, name, fwd)
        right = jax.lax.ppermute(lo, name, bwd)
        outs.append(jnp.concatenate([left, q, right], axis=axis))
    return tuple(outs)


def make_sharded_transeq_v3(solver, dmesh: DeviceMesh, terms=2,
                            interpret=False):
    """Build fn(u, v, w) -> (du, dv, dw) over globally-sharded fields:
    one shard_map wrapping the three fused direction sweeps. Species
    run through make_sharded_species_v3 (the merged ride-along variant
    measured 0.63x the standalone kernels on chip and was removed)."""
    shards, dims = _axis_shards(solver, dmesh)
    local = tuple(dims[a] // shards[a][0] for a in range(3))
    fns, halo_ws, nb_loc = {}, {}, {}
    for axis, accumulate in ((2, False), (0, True), (1, True)):
        ns, name = shards[axis]
        fns[axis] = make_transeq_dir_v3(
            solver.ops[axis], solver.nu, axis, local, terms=terms,
            accumulate=accumulate, interpret=interpret, n_shards=ns)
        halo_ws[axis] = _halo_w(axis, terms)
        bs = 128 if axis == 2 else 64
        nb_loc[axis] = local[axis] // bs

    def local_fn(u, v, w):
        acc = None
        for axis in (2, 0, 1):
            ns, name = shards[axis]
            kw = {}
            if ns > 1:
                kw["exts"] = _exchange_halo((u, v, w), axis, name,
                                            ns, halo_ws[axis],
                                            local[axis])
                kw["off"] = jax.lax.axis_index(name) * nb_loc[axis]
            if acc is None:
                acc = fns[axis](u, v, w, **kw)
            else:
                acc = fns[axis](u, v, w, acc=acc, **kw)
        return acc

    fspec = P(*field_spec(dmesh, dims))
    # check_vma off: pallas_call outputs carry no varying-mesh-axes info
    return jax.shard_map(local_fn, mesh=dmesh,
                         in_specs=(fspec,) * 3,
                         out_specs=(fspec,) * 3,
                         check_vma=False)


def make_sharded_species_v3(solver, dmesh: DeviceMesh, terms=2,
                            interpret=False):
    """Sharded all-species transport RHS: per-shard fused species sweeps
    (ops/pallas_kernels.make_species_dir_v3 halo-ext mode) with the conv
    and phi halo planes exchanged over ICI per direction — the species
    analogue of make_sharded_transeq_v3 (reference transeq_species,
    solver.f90:507-601, runs through the same DistD2 pipeline as
    momentum). fn(phis, u, v, w) -> per-species rhs tuple over
    globally-sharded fields; raises ValueError when the local shards
    don't satisfy the kernel tiling."""
    from ..ops.pallas_kernels import make_species_dir_v3
    nus = solver.nu_species
    shards, dims = _axis_shards(solver, dmesh)
    local = tuple(dims[a] // shards[a][0] for a in range(3))
    fns, halo_ws, nb_loc = {}, {}, {}
    for axis, accumulate in ((2, False), (0, True), (1, True)):
        ns, name = shards[axis]
        fns[axis] = make_species_dir_v3(
            solver.ops[axis], nus, axis, local, terms=terms,
            accumulate=accumulate, interpret=interpret, n_shards=ns)
        halo_ws[axis] = _halo_w(axis, terms)
        bs = 128 if axis == 2 else 64
        nb_loc[axis] = local[axis] // bs

    nsp = len(nus)

    def local_fn(phi, u, v, w):
        phis = tuple(phi[i] for i in range(nsp))
        comps = (u, v, w)
        acc = None
        for axis in (2, 0, 1):
            ns, name = shards[axis]
            kw = {}
            if ns > 1:
                kw["exts"] = _exchange_halo((comps[axis],) + phis, axis,
                                            name, ns, halo_ws[axis],
                                            local[axis])
                kw["off"] = jax.lax.axis_index(name) * nb_loc[axis]
            if acc is None:
                acc = fns[axis](phis, comps[axis], **kw)
            else:
                acc = fns[axis](phis, comps[axis], acc=acc, **kw)
        return jnp.stack(acc)

    fspec = P(*field_spec(dmesh, dims))
    pspec = P(*((None,) + tuple(fspec)))
    sharded = jax.shard_map(local_fn, mesh=dmesh,
                            in_specs=(pspec,) + (fspec,) * 3,
                            out_specs=pspec, check_vma=False)

    def fn(phis, u, v, w):
        out = sharded(jnp.stack(list(phis)), u, v, w)
        return tuple(out[i] for i in range(nsp))

    return fn


# ---------------------------------------------------------------------------
# Sharded x-direction applies: the x axis is never sharded on the (y,z)
# device mesh (the reference's nproc_dir(1)==1 constraint), so the dense
# x-stage contractions of the projection and the einsum transeq fallback
# are shard-local. Running them as per-shard Pallas K-blocked kernels
# (ops/pallas_poisson.make_x_apply) recovers the single-chip kernel
# economics — an XLA HIGH einsum does not overlap its bf16 passes with
# HBM streaming (~26 TF/s), the split-dot kernel does (~51 TF/s).
# ---------------------------------------------------------------------------


class PallasXApplyOp:
    """CompactOp look-alike whose axis-0 apply runs a shard-mapped
    Pallas kernel on each device's local block."""

    def __init__(self, op, dmesh, fspec_in, fspec_out, interpret, terms):
        from ..ops.pallas_poisson import make_x_apply
        self._op = op
        fn = make_x_apply(op.M64, terms=terms, interpret=interpret)
        self._fn = jax.shard_map(fn, mesh=dmesh, in_specs=(fspec_in,),
                                 out_specs=fspec_out, check_vma=False)

    def __getattr__(self, name):
        return getattr(self._op, name)

    def __call__(self, f, axis):
        if axis != 0:
            raise ValueError("x-apply op built for axis 0")
        return self._fn(f)


def sharded_x_apply_supported(solver, dmesh, t1=8, t2=128) -> bool:
    """Every device-local (y, z) block must satisfy the kernel tiling
    (t1 | ny_loc, t2 | nz_loc) for both VERT and CELL extents."""
    for loc in (DataLoc.VERT, DataLoc.CELL):
        dims = solver.mesh.dims(loc)
        spec = tuple(field_spec(dmesh, dims))
        ny_loc = dims[1] // (dmesh.shape[spec[1]] if spec[1] else 1)
        nz_loc = dims[2] // (dmesh.shape[spec[2]] if spec[2] else 1)
        if ny_loc % t1 or nz_loc % t2:
            return False
    return True


def repencil_supported(solver, dmesh) -> bool:
    """Repencilled slab projection: the single-chip slab/mid pressure
    kernels need full (y,z) planes, so sharded runs transpose the
    x-spectral divergence field to an x-sharded layout (two tiled
    all-to-alls over the mesh axes — the 2DECOMP/cuFFTMp repencilling
    pattern, reference decomp/2decomp) and run the merged kernel on each
    device's x-plane batch. Requires the single-chip STRUCTURAL slab
    gates plus x divisibility by the device count — not the VMEM gate:
    when the full-plane Pallas mid exceeds the VMEM cap (1024^2 planes),
    make_repencilled_pressure swaps in the tiled mid kernels (or the XLA
    einsum mid as last resort) and repencilling stays worthwhile
    (all-to-all volume ~5x below the GSPMD all-reduce fallback,
    docs/SCALING.md)."""
    from ..ops.pallas_poisson import slab_pressure_supported
    if not slab_pressure_supported(solver, structure_only=True):
        # structural tiling gates failed
        return False
    # the local x-stage kernels need every device-local (y,z) block to
    # satisfy their tiling — without this the x-apply grid collapses to
    # zero iterations and returns uninitialised buffers
    if not sharded_x_apply_supported(solver, dmesh):
        return False
    # every active mesh axis must genuinely shard both VERT and CELL
    # extents (field_spec leaves non-dividing axes replicated, which the
    # all-to-all transposes cannot handle)
    for loc in (DataLoc.VERT, DataLoc.CELL):
        dims = solver.mesh.dims(loc)
        spec = tuple(field_spec(dmesh, dims))
        for axn, ax in (("y", 1), ("z", 2)):
            if dmesh.shape[axn] > 1 and spec[ax] != axn:
                return False
    nx = solver.mesh.dims(DataLoc.CELL)[0]
    return nx % dmesh.devices.size == 0


def make_repencilled_pressure(solver, dmesh: DeviceMesh, terms=2,
                              interpret=False):
    """Build fn(u, v, w, keep_pressure) -> (u', v', w', p) running the
    fused slab-projection kernel stack per shard:

      x-apply (local)  ->  all-to-all to x-sharded  ->  merged slab
      kernel on full (y,z) planes  ->  all-to-all back  ->  gradient
      x-apply with fused correction (local)

    Exactly the single-chip arithmetic (same matrices, same kernels), so
    sharded == single up to collective reduction order."""
    import os
    from ..ops.pallas_poisson import (make_pressure_slab,
                                      slab_pressure_supported)
    slab = make_pressure_slab(solver, terms=terms, interpret=interpret)
    xk, make_mid_local = slab[2], slab[4]
    dims = solver.mesh.dims(DataLoc.VERT)
    nxc, ny, nz = solver.mesh.dims(DataLoc.CELL)
    nproc = dmesh.devices.size
    nx_loc = nxc // nproc
    # full-plane Pallas mid when it fits the VMEM cap (gate checked at
    # the ACTUAL precision mode, not the worst case); large-plane
    # meshes (1024^3: full planes cost 112-126 MB VMEM) fall to the
    # y/z-tiled mid kernels, and only configurations outside the tiled
    # fast path take the XLA einsum replay of the same stage bodies
    if (slab_pressure_supported(solver, terms=terms)
            and os.environ.get("X3D2_EINSUM_MID", "0") != "1"):
        mid_local = make_mid_local(nx_loc)
    elif (make_mid_local.tiled_supported
            and os.environ.get("X3D2_EINSUM_MID", "0") != "1"):
        mid_local = make_mid_local.tiled(nx_loc)
    else:
        mid_local = make_mid_local.einsum(nx_loc)
    fspec = P(*field_spec(dmesh, dims))
    po = solver.poisson
    # the SAME per-plane solve tables the single-chip mid kernel uses
    # (incl. the Nyquist mx mask), sliced per shard at run time
    k2x_full, tx2_full, mx_full = make_mid_local.tables[3:6]
    pz_dim = dmesh.shape["z"]

    def a2a_to_x(f):
        # (nx, ny_loc, nz_loc) -> (nx_loc, ny, nz)
        for ax_name, concat in zip(("y", "z"), (1, 2)):
            if dmesh.shape[ax_name] > 1:
                f = jax.lax.all_to_all(f, ax_name, split_axis=0,
                                       concat_axis=concat, tiled=True)
        return f

    def a2a_from_x(f):
        for ax_name, split in zip(("z", "y"), (2, 1)):
            if dmesh.shape[ax_name] > 1:
                f = jax.lax.all_to_all(f, ax_name, split_axis=split,
                                       concat_axis=0, tiled=True)
        return f

    def local_fn(u, v, w):
        du = xk["sx"](u)
        dv = xk["ix"](v)
        dw = xk["ix"](w)
        du, dv, dw = a2a_to_x(du), a2a_to_x(dv), a2a_to_x(dw)
        # this shard's global x range after the y-then-z transposes
        off = ((jax.lax.axis_index("y") * pz_dim
                + jax.lax.axis_index("z")) * nx_loc)

        def sl(t):
            return jax.lax.dynamic_slice(t, (off,), (nx_loc,))

        q, p_zy, dpdy, dpdz = mid_local(du, dv, dw, sl(k2x_full),
                                        sl(tx2_full), sl(mx_full))
        p_zy, dpdy, dpdz = (a2a_from_x(p_zy), a2a_from_x(dpdy),
                            a2a_from_x(dpdz))
        un = xk["gx_s_sub"](p_zy, u)
        vn = xk["gx_i_sub"](dpdy, v)
        wn = xk["gx_i_sub"](dpdz, w)
        return un, vn, wn, a2a_from_x(q)

    cell_spec = P(*field_spec(dmesh, (nxc, ny, nz)))
    sharded = jax.shard_map(
        local_fn, mesh=dmesh, in_specs=(fspec,) * 3,
        out_specs=(fspec,) * 3 + (cell_spec,), check_vma=False)

    def fn(u, v, w, keep_pressure=True):
        un, vn, wn, p = sharded(u, v, w)
        if keep_pressure:
            # physical p: inverse transforms as GSPMD contractions on
            # the sharded spectral solution (y/z span shards); q's y
            # basis may be block-parity-ordered (bfly)
            from ..ops.compact import apply_matrix
            for a in range(3):
                Ti_a = (make_mid_local.ti_x, make_mid_local.ti_y,
                        make_mid_local.ti_z)[a]
                p = apply_matrix(Ti_a, p, a)
        return un, vn, wn, p

    return fn


def wrap_x_ops(solver, dmesh, terms=2, interpret=False):
    """Return the solver's AxisOps[0] bundle with every operator's apply
    routed through a shard-mapped Pallas x-kernel."""
    import dataclasses
    dims = solver.mesh.dims(DataLoc.VERT)
    spec = tuple(field_spec(dmesh, dims))
    ox = solver.ops[0]
    wrapped = {}
    for name in ("der1st", "der1st_sym", "der2nd", "der2nd_sym",
                 "stagder_v2p", "interpl_v2p", "stagder_p2v",
                 "interpl_p2v"):
        op = getattr(ox, name)
        fs = P(None, spec[1], spec[2])
        wrapped[name] = PallasXApplyOp(op, dmesh, fs, fs, interpret,
                                       terms)
    return dataclasses.replace(ox, **wrapped)
