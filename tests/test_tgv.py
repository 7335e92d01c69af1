"""End-to-end Taylor-Green vortex smoke + physics tests (float64, CPU).

Validation signals follow the reference monitoring semantics
(postprocess/monitoring.f90): enstrophy, div(u) max/mean, KE decay.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.io.monitoring import make_observables_fn


def make_case(n=32, time_intg="AB3", dt=1e-3, Re=1600.0):
    mesh = Mesh(global_vert_dims=(n, n, n), L=(2 * np.pi,) * 3,
                BCs=((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=Re, time_intg=time_intg, dt=dt,
                          n_iters=10, n_output=1000)
    return TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)


@pytest.mark.parametrize("time_intg", ["AB3", "RK3"])
def test_tgv_divergence_free_and_ke_decay(time_intg):
    case = make_case(time_intg=time_intg)
    obs_fn = make_observables_fn(case.solver)
    state = case.initial_state()
    obs0 = {k: float(v) for k, v in
            obs_fn(state["u"], state["v"], state["w"]).items()}
    # analytic TGV initial KE = 1/16 * 2 = 0.125
    assert abs(obs0["ke"] - 0.125) < 1e-10
    state = case.run(n_iters=10, state=state, n_output=10**9)
    obs = {k: float(v) for k, v in
           obs_fn(state["u"], state["v"], state["w"]).items()}
    # projection enforces div-free to near machine precision in f64
    assert obs["div_u_max"] < 1e-10, obs
    # viscous decay: KE must decrease but stay close to initial
    assert 0.1 < obs["ke"] < 0.125, obs
    assert np.isfinite(obs["enstrophy"])


def test_tgv_ab3_rk3_agree():
    """Different integrators must agree to integration-scheme accuracy
    over a short horizon (mirrors the reference's time-integrator
    order-of-convergence intent)."""
    n_steps = 10
    ca = make_case(time_intg="AB3", dt=5e-4)
    cr = make_case(time_intg="RK3", dt=5e-4)
    sa = ca.run(n_iters=n_steps, state=ca.initial_state(), n_output=10**9)
    sr = cr.run(n_iters=n_steps, state=cr.initial_state(), n_output=10**9)
    du = np.max(np.abs(np.asarray(sa["u"]) - np.asarray(sr["u"])))
    assert du < 1e-7, du


def test_tgv_species_transport():
    """Passive scalar: transported field stays bounded and near-conserved."""
    n = 24
    mesh = Mesh(global_vert_dims=(n, n, n), L=(2 * np.pi,) * 3,
                BCs=((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="RK2", dt=1e-3,
                          n_species=1, pr_species=(0.7,))
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    state = case.initial_state()
    m0 = float(jnp.mean(state["phi"][0]))
    state = case.run(n_iters=5, state=state, n_output=10**9)
    phi = np.asarray(state["phi"][0])
    assert np.isfinite(phi).all()
    # mean is conserved by the skew-symmetric periodic transport
    assert abs(float(phi.mean()) - m0) < 1e-12
    assert np.abs(phi).max() < 1.5
