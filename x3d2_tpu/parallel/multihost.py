"""Multi-host (multi-process) execution scaffolding.

The reference is multi-node MPI end-to-end (src/mesh.f90:160-194 builds
the rank topology; every backend op exchanges halos over
MPI_COMM_WORLD). The jax equivalent: one process per host initialises
the distributed runtime (jax.distributed.initialize), jax.devices()
becomes the GLOBAL device list, and the same jitted sharded step
(parallel/topo.py) runs SPMD across processes — GSPMD/shard_map
collectives ride ICI within a slice and DCN across slices. Host-side IO
is gathered with process_allgather and written by process 0 only
(the reference's root-rank pattern, e.g. scalar_series.f90).

Environment-driven init (set by the launcher on every host):
  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        total process count
  JAX_PROCESS_ID           this process's rank
(or pass them explicitly to init_distributed).
"""

from __future__ import annotations

import os

import numpy as np


def maybe_init_distributed(coordinator=None, num_processes=None,
                           process_id=None, local_device_ids=None) -> bool:
    """Initialise the jax distributed runtime when configured. Returns
    True when running multi-process. No-op (False) for the common
    single-process case so the CLI works unchanged."""
    explicit = coordinator is not None
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator or num_processes <= 1:
        if explicit or (coordinator and num_processes <= 1):
            # a coordinator was requested but the cluster shape is
            # missing: failing silently would run N independent
            # simulations clobbering each other's output
            raise ValueError(
                "multi-host requested (coordinator set) but "
                "JAX_NUM_PROCESSES/JAX_PROCESS_ID are not configured")
        return False
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def is_primary() -> bool:
    return process_index() == 0


def gather_global(x) -> np.ndarray:
    """Full host copy of a (possibly multi-host-sharded) array.
    Collective for non-addressable arrays: every process must call it;
    all receive the global value. Fully-addressable arrays (single
    process, or process-local data like IBM masks replicated on every
    host) pass straight through np.asarray — feeding those to
    process_allgather would CONCATENATE the per-process copies."""
    import jax
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
