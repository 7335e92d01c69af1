"""Multi-host execution: a 2-process CPU cluster (jax.distributed local
collectives over localhost) must run the sharded step and reproduce the
single-process trajectory — the analogue of the reference's multi-node
MPI runs tested with oversubscribed ranks (SURVEY.md section 4)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def test_misconfigured_coordinator_raises():
    """--coordinator without a cluster shape must fail loudly, not run N
    independent simulations that clobber each other's output."""
    from x3d2_tpu.parallel.multihost import maybe_init_distributed
    for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        os.environ.pop(k, None)
    with pytest.raises(ValueError, match="multi-host requested"):
        maybe_init_distributed(coordinator="127.0.0.1:1234")
    assert maybe_init_distributed() is False  # unconfigured: no-op


def test_gather_global_passthrough_for_addressable_arrays():
    """Fully-addressable arrays (single-process state, per-host IBM
    masks) must pass through unchanged — allgather would concatenate
    the replicated copies."""
    import jax.numpy as jnp
    from x3d2_tpu.parallel.multihost import gather_global
    x = jnp.arange(12.0).reshape(3, 4)
    g = gather_global(x)
    assert g.shape == (3, 4)
    assert np.array_equal(g, np.asarray(x))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": repo,  # drop the axon TPU plugin site
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests",
                                          "multihost_worker.py"),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    # reference: same case on this (single) process
    import jax
    import jax.numpy as jnp
    from x3d2_tpu.common import BC
    from x3d2_tpu.mesh import Mesh
    from x3d2_tpu.cases import SolverParams, TGVCase
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    state = case.initial_state()
    for _ in range(2):
        state = case._step(state)

    u = np.load(tmp_path / "u_global.npy")
    d = np.max(np.abs(u - np.asarray(state["u"])))
    assert d < 1e-13, d
