"""Multi-device sharding: a step sharded over the (y,z) device mesh must
reproduce the single-device result (the distributed-tridiagonal/pencil-FFT
equivalence the reference validates with oversubscribed MPI ranks)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.parallel import make_device_mesh, make_sharded_step


def cpu_devices():
    return jax.devices("cpu")


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8)])
def test_sharded_step_matches_single_device(mesh_shape):
    devices = cpu_devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    n = 32
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)

    # single-device reference
    state_ref = case.initial_state()
    for _ in range(3):
        state_ref = case._step(state_ref)

    dmesh = make_device_mesh(*mesh_shape, devices=devices)
    step, state = make_sharded_step(case, dmesh)
    for _ in range(3):
        state = step(state)

    for k in ("u", "v", "w", "p"):
        a = np.asarray(state_ref[k])
        b = np.asarray(state[k])
        assert np.max(np.abs(a - b)) < 1e-13, k


def test_sharded_nonperiodic_case():
    """Sharding must also hold for non-periodic (folded-FFT) BCs."""
    devices = cpu_devices()
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    from x3d2_tpu.cases import ChannelCase
    from x3d2_tpu.config import ChannelConfig
    mesh = Mesh((16, 17, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)))
    params = SolverParams(Re=4200.0, time_intg="RK2", dt=1e-3)
    case = ChannelCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                       verbose=False,
                       case_cfg=ChannelConfig(init_noise=(0.01, 0.0, 0.0)))
    state_ref = case.initial_state()
    for _ in range(2):
        state_ref = case._step(state_ref)

    dmesh = make_device_mesh(2, 2, devices=devices)
    step, state = make_sharded_step(case, dmesh)
    for _ in range(2):
        state = step(state)
    for k in ("u", "v", "w"):
        d = np.max(np.abs(np.asarray(state_ref[k]) - np.asarray(state[k])))
        assert d < 1e-13, (k, d)


def test_x_sharded_step_matches_single_device():
    """nproc_dir(1) > 1 (reference mesh.f90:160-194 allows any
    decomposition): an (x, y, z) device mesh must reproduce the
    single-device result. The Pallas fast paths are gated off (they
    need full x lines); the step runs halo/GSPMD operators + GSPMD
    spectral projection."""
    devices = cpu_devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    n = 32
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    state_ref = case.initial_state()
    for _ in range(3):
        state_ref = case._step(state_ref)

    dmesh = make_device_mesh(2, 2, devices=devices, nproc_x=2)
    assert dmesh.axis_names == ("x", "y", "z")
    step, state = make_sharded_step(case, dmesh)
    # x-sharded meshes must not wire the single-x-line kernel paths
    assert getattr(case._sharded_solver, "_transeq_v3", None) is None
    assert getattr(case._sharded_solver, "_repencil_pressure", None) is None
    for _ in range(3):
        state = step(state)
    for k in ("u", "v", "w", "p"):
        d = np.max(np.abs(np.asarray(state_ref[k]) - np.asarray(state[k])))
        assert d < 1e-13, (k, d)


def test_x_halo_apply_matches_dense():
    """The ppermute halo apply is axis-generic: along a sharded x axis
    it must equal the dense resolved-operator apply (the DistD2
    equivalence, exercised for y/z in test_halo.py)."""
    devices = cpu_devices()
    if len(devices) < 2:
        pytest.skip("needs 2 virtual devices")
    from x3d2_tpu.common import DataLoc
    from x3d2_tpu.parallel.halo import make_halo_apply
    n = 96  # 48-wide f64 halo band needs n_loc >= 48
    mesh = Mesh((n, 8, 8), (2 * np.pi, 1.0, 1.0),
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    op = case.solver.ops[0].der1st
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((n, 8, 8)))
    ref = op(f, 0)
    dmesh = make_device_mesh(1, 1, devices=devices[:2], nproc_x=2)
    fn = make_halo_apply(op, dmesh, "x", 0, w=48)
    got = fn(jax.device_put(f))
    assert np.max(np.abs(np.asarray(ref) - np.asarray(got))) < 1e-12
