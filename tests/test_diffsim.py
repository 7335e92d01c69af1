"""Differentiable / batched simulation (x3d2_tpu/diffsim.py).

The reference has no adjoint or ensemble capability (imperative Fortran
time loop, base_case.f90:181-353); these tests certify the capabilities
the functional design adds: exact discrete-adjoint gradients through the
full scheme (verified against central finite differences in float64) and
vmapped ensemble propagation matching per-member runs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu import diffsim


def make_case(n=16, time_intg="AB3", dt=1e-3):
    mesh = Mesh(global_vert_dims=(n, n, n), L=(2 * np.pi,) * 3,
                BCs=((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg=time_intg, dt=dt)
    return TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)


@pytest.mark.parametrize("time_intg", ["AB3", "RK3"])
def test_adjoint_gradient_matches_finite_difference(time_intg):
    """d(KE after k steps)/d(u0) along a random direction vs central FD."""
    case = make_case(time_intg=time_intg)
    f = jax.jit(diffsim.objective(case, diffsim.kinetic_energy, 5))
    state = case.initial_state()
    u0, v0, w0 = state["u"], state["v"], state["w"]

    g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
    gu, gv, gw = g(u0, v0, w0)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in (gu, gv, gw))

    rng = np.random.default_rng(7)
    du = [jnp.asarray(rng.standard_normal(u0.shape)) for _ in range(3)]
    directional = float(sum(jnp.vdot(a, b)
                            for a, b in zip((gu, gv, gw), du)))

    eps = 1e-6
    fp = float(f(u0 + eps * du[0], v0 + eps * du[1], w0 + eps * du[2]))
    fm = float(f(u0 - eps * du[0], v0 - eps * du[1], w0 - eps * du[2]))
    fd = (fp - fm) / (2 * eps)
    assert directional == pytest.approx(fd, rel=1e-6)


def test_remat_changes_nothing():
    """jax.checkpoint rematerialisation is value- and grad-neutral."""
    case = make_case()
    state = case.initial_state()
    u0, v0, w0 = state["u"], state["v"], state["w"]
    outs = []
    for remat in (False, True):
        f = diffsim.objective(case, diffsim.kinetic_energy, 3,
                              remat=remat)
        val, grads = jax.jit(jax.value_and_grad(f, (0, 1, 2)))(u0, v0, w0)
        outs.append((val, grads))
    assert float(outs[0][0]) == pytest.approx(float(outs[1][0]), rel=1e-14)
    for a, b in zip(outs[0][1], outs[1][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-15)


def test_ensemble_vmap_matches_member_runs():
    """One vmapped program == per-member sequential rollouts."""
    case = make_case()
    base = case.initial_state()
    rng = np.random.default_rng(3)
    members = []
    for _ in range(2):
        pert = {k: base[k] + 1e-3 * jnp.asarray(
                    rng.standard_normal(base[k].shape))
                for k in ("u", "v", "w")}
        members.append(dict(base, **pert))

    batched = diffsim.ensemble_rollout(case, diffsim.stack_states(members),
                                       n_steps=3)
    for i, m in enumerate(members):
        ref = diffsim.rollout(case, m, 3, remat=False)
        for k in ("u", "v", "w", "p"):
            np.testing.assert_allclose(
                np.asarray(batched[k][i]), np.asarray(ref[k]),
                rtol=1e-12, atol=1e-14, err_msg=f"member {i} field {k}")


def test_rollout_matches_step_loop():
    """rollout is exactly n applications of step_fn."""
    case = make_case()
    s_loop = case.initial_state()
    step = jax.jit(case.step_fn)
    for _ in range(4):
        s_loop = step(s_loop)
    s_roll = jax.jit(lambda s: diffsim.rollout(case, s, 4, remat=False))(
        case.initial_state())
    for k in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(s_roll[k]),
                                   np.asarray(s_loop[k]),
                                   rtol=1e-13, atol=1e-15)
    assert int(s_roll["istep"]) == int(s_loop["istep"])
