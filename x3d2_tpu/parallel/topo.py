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


def make_device_mesh(nproc_y: int, nproc_z: int, devices=None) -> DeviceMesh:
    """2-D device mesh over (y, z), like the reference's nproc_dir with
    nproc_dir(1)==1 (x kept whole)."""
    if devices is None:
        devices = jax.devices()
    n = nproc_y * nproc_z
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
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
    return P(None,
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
        elif k == "olds":
            # olds is a pytree matching fields with a leading history axis
            out[k] = jax.tree_util.tree_map(fsh, v)
        else:  # scalars (istep, key)
            out[k] = NamedSharding(dmesh, P())
    return out


def shard_state(dmesh: DeviceMesh, state) -> dict:
    """Place a case state pytree onto the device mesh."""
    return jax.device_put(state, state_shardings(dmesh, state))


def make_sharded_step(case, dmesh: DeviceMesh, state=None,
                      pin_shardings=None):
    """jit the case step sharded over the device mesh.

    On TPU, in/out shardings are pinned explicitly (stable state layout,
    donation-friendly). On the virtual CPU test mesh, explicit output
    shardings trigger an XLA:CPU FFT-thunk layout RET_CHECK, so there we
    only place the inputs and let GSPMD propagate; the propagated field
    shardings come out identical (verified by tests/test_sharding.py)."""
    if state is None:
        state = case.initial_state()
    # Pallas kernels are single-device programs: under GSPMD they would
    # need manual partitioning (shard_map-wrapped kernels, planned), so the
    # sharded step falls back to the einsum paths.
    for attr in ("_pallas_transeq", "_banded_transeq", "_transeq_v3"):
        if getattr(case.solver, attr, None) is not None:
            object.__setattr__(case.solver, attr, None)
    sh = state_shardings(dmesh, state)
    if pin_shardings is None:
        pin_shardings = dmesh.devices.flat[0].platform != "cpu"
    if pin_shardings:
        step = jax.jit(case.step_fn, in_shardings=(sh,), out_shardings=sh,
                       donate_argnums=0)
    else:
        step = jax.jit(case.step_fn, donate_argnums=0)
    return step, jax.device_put(state, sh)
