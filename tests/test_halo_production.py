"""The production sharded step must use ppermute halo exchanges for the
compact operators (the DistD2 analogue, reference
src/backend/omp/exec_dist.f90:16-65) instead of GSPMD reduce-scattering
full partial products — and still match the single-device result.

Shards must be at least halo_width(dtype) points wide for the
truncation-exact band, so this test uses a y-elongated grid; the 32^3
tests in test_sharding.py deliberately exercise the GSPMD fallback."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.parallel import make_device_mesh, make_sharded_step
from x3d2_tpu.parallel.topo import make_halo_solver
from x3d2_tpu.parallel.halo import HaloCompactOp, halo_width


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="module")
def case_and_mesh():
    devices = cpu_devices()
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    n = (16, 192, 16)
    mesh = Mesh(n, (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    dmesh = make_device_mesh(4, 1, devices=devices)
    return case, dmesh


def test_halo_solver_wraps_sharded_axis(case_and_mesh):
    case, dmesh = case_and_mesh
    hs = make_halo_solver(case.solver, dmesh)
    assert hs is not case.solver
    assert getattr(hs, "_halo_mode", False)
    # y is sharded 4-way with 48-point shards == halo_width(f64): wrapped
    assert isinstance(hs.ops[1].der1st, HaloCompactOp)
    assert isinstance(hs.ops[1].stagder_v2p, HaloCompactOp)
    # x is never sharded; z mesh dim is 1: plain ops
    assert not isinstance(hs.ops[0].der1st, HaloCompactOp)
    assert not isinstance(hs.ops[2].der1st, HaloCompactOp)
    assert halo_width(jnp.float64) == 48


def test_halo_sharded_step_matches_single_device(case_and_mesh):
    case, dmesh = case_and_mesh
    state_ref = case.initial_state()
    for _ in range(3):
        state_ref = case._step(state_ref)

    step, state = make_sharded_step(case, dmesh)
    assert getattr(case.solver, "_halo_mode", False) is False  # original untouched
    for _ in range(3):
        state = step(state)
    for k in ("u", "v", "w", "p"):
        d = np.max(np.abs(np.asarray(state_ref[k]) - np.asarray(state[k])))
        assert d < 1e-12, (k, d)


def test_halo_step_hlo_uses_collective_permute(case_and_mesh):
    """The compiled sharded step must contain collective-permute ops (the
    halo exchanges); the only global collectives should come from the
    spectral transforms."""
    case, dmesh = case_and_mesh
    state = case.initial_state()
    from x3d2_tpu.parallel.topo import state_shardings
    sh = state_shardings(dmesh, state)
    import copy
    c2 = copy.copy(case)
    c2.solver = make_halo_solver(case.solver, dmesh)
    lowered = jax.jit(c2.step_fn).lower(jax.device_put(state, sh))
    txt = lowered.compile().as_text()
    assert "collective-permute" in txt
