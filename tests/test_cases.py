"""Channel, cylinder and generic case smoke + behavior tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import ChannelCase, CylinderCase, GenericCase, SolverParams
from x3d2_tpu.config import ChannelConfig, CylinderConfig


def test_channel_case_runs_and_enforces_walls():
    mesh = Mesh((16, 17, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)))
    params = SolverParams(Re=4200.0, time_intg="RK3", dt=2e-3)
    ccfg = ChannelConfig(init_noise=(0.01, 0.01, 0.01),
                         inlet_noise=(0.001, 0.0, 0.0),
                         rotation=True, omega_rot=0.1, n_rotate=3)
    case = ChannelCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                       verbose=False, case_cfg=ccfg)
    state = case.run(n_iters=3, state=case.initial_state(), n_output=10**9)
    u = np.asarray(state["u"])
    assert np.isfinite(u).all()
    # wall planes carry only the (small) stamped noise; the last
    # pressure-correction adds a gradient update on top, so they must stay
    # near zero rather than the bulk ~1
    assert np.abs(np.asarray(state["v"])[:, 0, :]).max() < 0.2
    # bulk correction keeps mean streamwise velocity near 2/3
    ncell = np.prod(mesh.global_cell_dims)
    assert abs(u.sum() / ncell - 2.0 / 3.0) < 0.1


def test_cylinder_case_with_ibm_runs():
    mesh = Mesh((33, 17, 8), (20.0, 10.0, 2.0),
                ((BC.DIRICHLET, BC.DIRICHLET),
                 (BC.NEUMANN, BC.NEUMANN),
                 (BC.PERIODIC, BC.PERIODIC)))
    params = SolverParams(Re=300.0, time_intg="AB2", dt=2e-3, ibm_on=True)
    case = CylinderCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                        verbose=False,
                        case_cfg=CylinderConfig(init_noise=(0.01, 0.01, 0.0),
                                                inlet_noise=(0.01, 0.0, 0.0)))
    # mask must be solid inside the cylinder
    ep = np.asarray(case.ep)
    assert ep.min() == 0.0 and ep.max() == 1.0
    state = case.run(n_iters=3, state=case.initial_state(), n_output=10**9)
    u = np.asarray(state["u"])
    assert np.isfinite(u).all()
    # velocity is zeroed inside the body right before the projection; after
    # the final gradient update it stays small inside the solid region
    ctr = np.unravel_index(np.argmin(ep[:, :, 0]), ep[:, :, 0].shape)
    assert abs(u[ctr[0], ctr[1], 0]) < 0.5
    # inflow plane close to 1 (noise amplitude ~ e^{-0.2 (L/2)^2} tiny)
    assert abs(u[0].mean() - 1.0) < 0.1


def test_cylinder_reference_bcs_runs():
    """The reference cylinder example uses x-Dirichlet in/outflow with
    periodic y,z (examples/cylinder/input.x3d) -> Poisson variant 100."""
    mesh = Mesh((33, 16, 8), (20.0, 10.0, 2.0),
                ((BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC),
                 (BC.PERIODIC, BC.PERIODIC)))
    params = SolverParams(Re=300.0, time_intg="AB3", dt=2e-3, ibm_on=True)
    case = CylinderCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                        verbose=False,
                        case_cfg=CylinderConfig(inlet_noise=(0.01, 0.0, 0.0)))
    state = case.run(n_iters=3, state=case.initial_state(), n_output=10**9)
    assert np.isfinite(np.asarray(state["u"])).all()


def test_generic_case_freestream_invariant():
    """Uniform freestream is an exact steady solution on a periodic box."""
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=100.0, time_intg="RK2", dt=1e-2)
    case = GenericCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                       verbose=False)
    state = case.run(n_iters=5, state=case.initial_state(), n_output=10**9)
    assert np.max(np.abs(np.asarray(state["u"]) - 1.0)) < 1e-12
    assert np.max(np.abs(np.asarray(state["v"]))) < 1e-12


def test_chunked_run_matches_per_step(monkeypatch, tmp_path):
    """run()'s chunked dispatch (fori_loop over step_fn between output
    boundaries) is bit-identical to the per-step loop: same traced step
    body, so XLA executes the same program per iteration."""
    from x3d2_tpu.cases import TGVCase

    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)

    def final(chunk_env):
        monkeypatch.setenv("X3D2_CHUNK", chunk_env)
        case = TGVCase(mesh, params, dtype=jnp.float64,
                       monitor_path=None, verbose=False)
        # n_output=3 exercises mid-run boundaries and a partial tail
        state = case.run(n_iters=7, state=case.initial_state(),
                         n_output=3)
        assert int(state["istep"]) == 8
        return np.asarray(state["u"]), np.asarray(state["v"])

    u1, v1 = final("1")
    u0, v0 = final("0")
    np.testing.assert_array_equal(u1, u0)
    np.testing.assert_array_equal(v1, v0)
