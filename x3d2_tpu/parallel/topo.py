"""Device-mesh decomposition and sharded stepping.

TPU-native replacement for the reference's MPI domain decomposition
(mesh.f90:160-194 decomposition_generic, par_t neighbor topology): fields
are sharded over a 2-D jax.sharding.Mesh with axes ('y', 'z') — mirroring
the reference's nproc_dir constraint that the x direction stays whole for
the FFT path (poisson_fft.f90:131). Under jit, XLA's SPMD partitioner
inserts the ICI collectives that the reference implements by hand:
  - the compact-operator einsums contract over sharded axes ->
    reduce-scatter/all-gather (the analogue of DistD2's interface solve)
  - FFTs along sharded axes -> all-to-all repencilling (the analogue of
    2DECOMP/cuFFTMp transposes)
No manual ppermute is required for correctness; a halo-exchange fast path
with band-truncated operators is the optimisation route (ops/compact.py
banding note).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P


def make_device_mesh(nproc_y: int, nproc_z: int, devices=None,
                     nproc_x: int = 1) -> DeviceMesh:
    """Device mesh over (y, z) — or (x, y, z) when nproc_x > 1 — the
    analogue of the reference's arbitrary nproc_dir(3) decomposition
    (mesh.f90:160-194 decomposition_generic). The default keeps x whole
    (the lane/solve axis: every Pallas kernel and the spectral x stage
    want full lines); an x-decomposed mesh runs the operator path via
    ppermute halo applies along x (parallel/halo.py is axis-generic) and
    the projection via GSPMD spectral contractions — correct everywhere,
    without the single-axis kernel fast paths."""
    if devices is None:
        # honour a pinned jax_default_device (e.g. the CPU backend under
        # the axon relay, tests/conftest.py): build the mesh from that
        # platform's devices, not the global default list
        dd = jax.config.jax_default_device
        if dd is None:
            devices = jax.devices()
        else:
            # jax_default_device may be a Device or a platform string
            platform = dd if isinstance(dd, str) else dd.platform
            devices = jax.devices(platform)
    n = nproc_x * nproc_y * nproc_z
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if nproc_x > 1:
        dev = np.asarray(devices[:n]).reshape(nproc_x, nproc_y, nproc_z)
        return DeviceMesh(dev, axis_names=("x", "y", "z"))
    dev = np.asarray(devices[:n]).reshape(nproc_y, nproc_z)
    return DeviceMesh(dev, axis_names=("y", "z"))


def field_spec(dmesh: DeviceMesh = None, shape=None) -> P:
    """(nx, ny, nz) fields: shard y and z axes. Axes whose extent does not
    divide the mesh dimension (e.g. odd vertex counts on wall-normal
    Dirichlet axes) are left unsharded -- GSPMD requires even splits."""
    if dmesh is None or shape is None:
        return P(None, "y", "z")
    ny = dmesh.shape["y"]
    nz = dmesh.shape["z"]
    nx = dmesh.shape["x"] if "x" in dmesh.axis_names else 1
    return P("x" if nx > 1 and shape[-3] % nx == 0 else None,
             "y" if shape[-2] % ny == 0 else None,
             "z" if shape[-1] % nz == 0 else None)


def state_shardings(dmesh: DeviceMesh, state) -> dict:
    """NamedShardings for a case state pytree."""

    def fsh(f):
        spec = field_spec(dmesh, f.shape)
        lead = (None,) * (f.ndim - 3)
        return NamedSharding(dmesh, P(*(lead + tuple(spec))))

    out = {}
    for k, v in state.items():
        if k in ("u", "v", "w", "p", "phi"):
            out[k] = fsh(v)
        elif k in ("olds", "comp"):
            # pytrees of field-shaped arrays (AB history / Kahan comps)
            out[k] = jax.tree_util.tree_map(fsh, v)
        else:  # scalars (istep, key)
            out[k] = NamedSharding(dmesh, P())
    return out


def shard_state(dmesh: DeviceMesh, state) -> dict:
    """Place a case state pytree onto the device mesh."""
    return jax.device_put(state, state_shardings(dmesh, state))


def make_halo_solver(solver, dmesh: DeviceMesh, w=None):
    """Wrap the solver's compact operators along sharded axes with
    ppermute halo applies (parallel/halo.py) — the production DistD2
    analogue (reference src/backend/omp/exec_dist.f90:16-65): each
    implicit solve costs one neighbour exchange of w planes instead of a
    GSPMD reduce-scatter of full partial products. Axes whose extents
    don't divide the mesh, aren't sharded, or whose shards are narrower
    than the truncation-exact band stay on the GSPMD path. Returns the
    original solver when nothing is wrappable."""
    import dataclasses
    from ..common import DataLoc
    from .halo import halo_width, make_halo_axis_ops

    w = w or halo_width(solver.dtype)
    dims = solver.mesh.dims(DataLoc.VERT)
    spec = tuple(field_spec(dmesh, dims))
    mesh_axes = {1: "y", 2: "z"}
    if "x" in dmesh.axis_names:
        mesh_axes[0] = "x"
    new_ops, wrapped = [], False
    for axis in range(3):
        o = solver.ops[axis]
        name = mesh_axes.get(axis)
        if name is not None and spec[axis] == name:
            ns = dmesh.shape[name]
            n = o.der1st.n_in
            if (ns > 1 and o.der1st.n_out == n and n % ns == 0
                    and n // ns >= w):
                try:
                    new_ops.append(make_halo_axis_ops(
                        o, dmesh, name, axis, w, field_spec=P(*spec)))
                    wrapped = True
                    continue
                except ValueError:
                    pass  # band truncation check failed: GSPMD fallback
        new_ops.append(o)
    if not wrapped:
        return solver
    variant = dataclasses.replace(solver, ops=tuple(new_ops))
    object.__setattr__(variant, "_halo_mode", True)
    return variant


def make_sharded_step(case, dmesh: DeviceMesh, state=None,
                      pin_shardings=None, use_halo=True, aot=False):
    """jit the case step sharded over the device mesh.

    With aot=True the device mesh may be built from a deviceless
    TopologyDescription (jax.experimental.topologies — e.g. a mocked
    v5e 2x4 slice): no arrays are placed and the returned "state" is a
    ShapeDtypeStruct pytree; call step.lower(state).compile() to
    AOT-compile the full sharded program (incl. Mosaic lowering of the
    halo-ext kernels) without any attached multi-chip hardware.

    Compact operators along sharded axes run as explicit ppermute halo
    exchanges (make_halo_solver) when the shards are wide enough for the
    truncation-exact band; everything else (spectral transforms,
    elementwise) is GSPMD-partitioned. Pallas kernels are single-device
    programs and are dropped from the sharded variant.

    On TPU, in/out shardings are pinned explicitly (stable state layout,
    donation-friendly). On the virtual CPU test mesh, explicit output
    shardings trigger an XLA:CPU FFT-thunk layout RET_CHECK, so there we
    only place the inputs and let GSPMD propagate; the propagated field
    shardings come out identical (verified by tests/test_sharding.py)."""
    import copy
    import dataclasses

    if state is None:
        state = case.initial_state()
    solver = case.solver
    halo_solver = make_halo_solver(solver, dmesh) if use_halo else solver
    if halo_solver is solver:
        # dataclasses.replace drops the Pallas kernel attributes (they
        # are single-device programs) and the fused-matrix cache; rebuild
        # the latter eagerly so no constants materialise under trace
        halo_solver = dataclasses.replace(solver)
        halo_solver._fused_pressure_mats()
    orig_case = case
    case = copy.copy(case)
    case.solver = halo_solver
    # the fused transeq+AB kernel chain is a single-device program too
    case._fused_ab = None
    # sharded v3 transeq: per-shard Pallas kernels + ppermute halos
    # (parallel/shard_kernels.py) whenever the local shards are tileable;
    # interpret mode on the virtual CPU mesh (no Mosaic there)
    import os
    x_sharded = "x" in dmesh.axis_names and dmesh.shape["x"] > 1
    if os.environ.get("X3D2_PALLAS", "1") != "0" and not x_sharded:
        # the Pallas fast paths (v3 sweeps, x-apply, repencilled slabs)
        # assume full x lines per shard; an x-decomposed mesh runs the
        # halo-operator + GSPMD spectral path built above
        from ..ops.compact import PRECISION
        from .shard_kernels import (make_sharded_transeq_v3,
                                    sharded_transeq_v3_supported,
                                    sharded_x_apply_supported, wrap_x_ops)
        terms = 3 if PRECISION == jax.lax.Precision.HIGHEST else 2
        interp = dmesh.devices.flat[0].platform != "tpu"
        if sharded_transeq_v3_supported(solver, dmesh, terms=terms):
            object.__setattr__(
                halo_solver, "_transeq_v3",
                make_sharded_transeq_v3(solver, dmesh, terms=terms,
                                        interpret=interp))
            if solver.nu_species and len(solver.nu_species) <= 8:
                # species sweeps ride the same halo-ext kernel tiling
                from .shard_kernels import make_sharded_species_v3
                try:
                    object.__setattr__(
                        halo_solver, "_species_v3",
                        make_sharded_species_v3(solver, dmesh,
                                                terms=terms,
                                                interpret=interp))
                except ValueError:
                    pass  # shard extents not tileable: operator path
        if (getattr(halo_solver, "_halo_mode", False)
                and sharded_x_apply_supported(solver, dmesh)):
            # the x axis is never sharded: its dense applies run as
            # per-shard Pallas K-blocked kernels inside shard_map
            object.__setattr__(
                halo_solver, "ops",
                (wrap_x_ops(solver, dmesh, terms=terms, interpret=interp),)
                + tuple(halo_solver.ops[1:]))
        from .shard_kernels import (make_repencilled_pressure,
                                    repencil_supported)
        if repencil_supported(solver, dmesh):
            # repencilled slab projection: all-to-all the x-spectral
            # divergence to an x-sharded layout and run the merged slab
            # kernel on full (y,z) planes per shard (2DECOMP analogue)
            object.__setattr__(
                halo_solver, "_repencil_pressure",
                make_repencilled_pressure(solver, dmesh, terms=terms,
                                          interpret=interp))
    # breadcrumb on the CALLER's case (the working case is a copy):
    # which solver variant the sharded step actually wired, for
    # introspection and wiring tests
    orig_case._sharded_solver = halo_solver
    sh = state_shardings(dmesh, state)
    if pin_shardings is None:
        pin_shardings = dmesh.devices.flat[0].platform != "cpu"
    if pin_shardings:
        step = jax.jit(case.step_fn, in_shardings=(sh,), out_shardings=sh,
                       donate_argnums=0)
    else:
        step = jax.jit(case.step_fn, donate_argnums=0)
    if aot:
        # deviceless: describe the state instead of placing it
        sds = jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            state, sh)
        return step, sds
    return step, jax.device_put(state, sh)
