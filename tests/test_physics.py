"""Physics validation: energy budget identities on the TGV flow.

For incompressible flow the skew-symmetric convection conserves energy,
so dKE/dt = -2 nu E where E = 0.5<|curl u|^2> (enstrophy) -- the exact
dissipation identity the reference's monitoring quantities are chosen to
track (monitoring.f90, BASELINE KE-parity signal)."""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.io.monitoring import make_observables_fn


def test_tgv_energy_budget():
    n = 32
    dt = 1e-3
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="RK3", dt=dt)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    obs = make_observables_fn(case.solver)
    state = case.initial_state()
    o0 = {k: float(v) for k, v in
          obs(state["u"], state["v"], state["w"]).items()}
    nsteps = 20
    state = case.run(n_iters=nsteps, state=state, n_output=10**9)
    o1 = {k: float(v) for k, v in
          obs(state["u"], state["v"], state["w"]).items()}

    nu = 1.0 / 1600.0
    dke_dt = (o1["ke"] - o0["ke"]) / (nsteps * dt)
    e_mid = 0.5 * (o0["enstrophy"] + o1["enstrophy"])
    expected = -2.0 * nu * e_mid
    assert abs(dke_dt - expected) < 0.01 * abs(expected), (dke_dt, expected)
    # initial enstrophy of the analytic TGV field is 3/8
    assert abs(o0["enstrophy"] - 0.375) < 1e-6
    # at early times enstrophy changes only slowly (production ~ t^2)
    assert abs(o1["enstrophy"] - o0["enstrophy"]) < 1e-3 * o0["enstrophy"]
    assert o1["ke"] < o0["ke"]


def test_species_diffusion_decay():
    """A quiescent periodic box diffuses a cosine scalar exactly:
    phi(t) = phi0 exp(-3 nu_s t). Exercises the full species time loop
    (RHS + AB update + history rotation) against a closed form —
    reference transeq_species semantics (solver.f90:507-601) composed
    with the time integrator."""
    from x3d2_tpu.cases.base import BaseCase
    from x3d2_tpu.common import DataLoc

    n = 32
    dt = 1e-3
    pr = 0.7
    nu = 1.0 / 100.0
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)

    class DiffusionCase(BaseCase):
        def initial_conditions(self):
            X, Y, Z = self.mesh.coord_grids(DataLoc.VERT)
            shape = self.mesh.dims(DataLoc.VERT)
            phi = np.broadcast_to(np.cos(X) * np.cos(Y) * np.cos(Z),
                                  shape)
            z = np.zeros(shape)
            return {"u": z, "v": z, "w": z, "phi": phi[None]}

    params = SolverParams(Re=100.0, time_intg="AB3", dt=dt,
                          n_species=1, pr_species=(pr,))
    case = DiffusionCase(mesh, params, dtype=jnp.float64,
                         monitor_path=None, verbose=False)
    nsteps = 50
    state = case.run(n_iters=nsteps, state=case.initial_state(),
                     n_output=10**9)
    nu_s = nu / pr
    decay = np.exp(-3.0 * nu_s * nsteps * dt)
    phi = np.asarray(state["phi"][0])
    X, Y, Z = mesh.coord_grids(DataLoc.VERT)
    ref = np.cos(X) * np.cos(Y) * np.cos(Z) * decay
    err = np.max(np.abs(phi - ref))
    # compact6 spatial error ~1e-8 at n=32; AB3 temporal error ~ (dt^3)
    assert err < 1e-6, err
    # velocities stay exactly zero
    for k in ("u", "v", "w"):
        assert float(np.max(np.abs(np.asarray(state[k])))) == 0.0, k


def test_species_with_compensated_accumulation():
    """Kahan-compensated stepping (the KE-parity production mode) must
    carry species too: the comp pytree includes phi and the trajectory
    tracks the plain-mode one at f32 rounding scale."""
    n = 24
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)

    def run(comp):
        params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                              n_species=1, pr_species=(0.7,),
                              compensated=comp)
        case = TGVCase(mesh, params, dtype=jnp.float32,
                       monitor_path=None, verbose=False)
        return case.run(n_iters=5, state=case.initial_state(),
                        n_output=10**9)

    sa, sb = run(False), run(True)
    assert "comp" in sb and len(sb["comp"]) == 4  # u,v,w,phi comps
    for k in ("u", "phi"):
        a, b = np.asarray(sa[k]), np.asarray(sb[k])
        assert np.isfinite(b).all()
        assert np.max(np.abs(a - b)) < 1e-5 * (np.max(np.abs(a)) + 1e-30)


def test_tgv_momentum_conservation():
    """Periodic box: mean momentum is exactly conserved by the
    skew-symmetric transport + projection."""
    n = 24
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB2", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    state = case.run(n_iters=10, state=case.initial_state(),
                     n_output=10**9)
    for k in ("u", "v", "w"):
        assert abs(float(np.mean(np.asarray(state[k])))) < 1e-13, k
