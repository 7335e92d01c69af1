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


def field_spec() -> P:
    """(nx, ny, nz) fields: shard y and z axes."""
    return P(None, "y", "z")


def state_shardings(dmesh: DeviceMesh, state) -> dict:
    """NamedShardings for a case state pytree."""
    fs = NamedSharding(dmesh, field_spec())
    out = {}
    for k, v in state.items():
        if k in ("u", "v", "w", "p"):
            out[k] = fs
        elif k == "phi":
            out[k] = NamedSharding(dmesh, P(None, None, "y", "z"))
        elif k == "olds":
            # olds is a pytree matching fields with a leading history axis
            out[k] = jax.tree_util.tree_map(
                lambda f: NamedSharding(
                    dmesh, P(*((None,) * (f.ndim - 3) + (None, "y", "z")))),
                v)
        else:  # scalars (istep)
            out[k] = NamedSharding(dmesh, P())
    return out


def shard_state(dmesh: DeviceMesh, state) -> dict:
    """Place a case state pytree onto the device mesh."""
    return jax.device_put(state, state_shardings(dmesh, state))


def make_sharded_step(case, dmesh: DeviceMesh, state=None):
    """jit the case step with explicit in/out shardings over the mesh."""
    if state is None:
        state = case.initial_state()
    sh = state_shardings(dmesh, state)
    step = jax.jit(case.step_fn, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=0)
    return step, jax.device_put(state, sh)
