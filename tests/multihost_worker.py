"""Worker for tests/test_multihost.py: one process of a 2-process CPU
cluster running a sharded TGV step (the oversubscribed-MPI analogue of
the reference's multi-node tests). Launched with JAX_COORDINATOR_ADDRESS
/ JAX_NUM_PROCESSES / JAX_PROCESS_ID set and JAX_PLATFORMS=cpu."""

import os
import sys

import numpy as np


def main(outdir):
    from x3d2_tpu.parallel.multihost import (gather_global, is_primary,
                                             maybe_init_distributed)
    assert maybe_init_distributed(), "distributed env not configured"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)

    from x3d2_tpu.common import BC
    from x3d2_tpu.mesh import Mesh
    from x3d2_tpu.cases import SolverParams, TGVCase
    from x3d2_tpu.parallel import make_device_mesh, make_sharded_step

    assert jax.process_count() == 2
    nd = jax.device_count()
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    ny = 2
    dmesh = make_device_mesh(ny, nd // ny)
    step, state = make_sharded_step(case, dmesh)
    for _ in range(2):
        state = step(state)
    u = gather_global(state["u"])
    assert np.isfinite(u).all()
    if is_primary():
        np.save(os.path.join(outdir, "u_global.npy"), u)
    print(f"process {jax.process_index()} OK ({nd} devices)")


if __name__ == "__main__":
    main(sys.argv[1])
