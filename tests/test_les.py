"""LES end-to-end: the hyperviscous second derivative
(der2nd_scheme='compact6-hyperviscous', reference src/tdsops.f90:443-458,
c_nu/nu0_nu spectral-viscosity closure) must run through the full case
step, stay stable, and dissipate kinetic energy faster than the plain
compact6 scheme on an under-resolved field."""

import numpy as np
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase


class NoisyTGV(TGVCase):
    """TGV IC plus high-wavenumber noise (the content the SVV closure
    damps)."""

    def initial_conditions(self):
        fields = super().initial_conditions()
        rng = np.random.default_rng(7)
        for k in ("u", "v", "w"):
            fields[k] = np.asarray(fields[k]) + 0.05 * rng.normal(
                size=np.shape(fields[k]))
        return fields


def _ke(state):
    u, v, w = state["u"], state["v"], state["w"]
    return float(0.5 * jnp.mean(u * u + v * v + w * w))


def _run(der2nd_scheme, n_iters=20):
    mesh = Mesh((32, 32, 32), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                          der2nd_scheme=der2nd_scheme,
                          c_nu=0.44, nu0_nu=4.0)
    case = NoisyTGV(mesh, params, dtype=jnp.float64, monitor_path=None,
                    verbose=False)
    state = case.initial_state()
    ke0 = _ke(state)
    for _ in range(n_iters):
        state = case._step(state)
    assert bool(jnp.isfinite(state["u"]).all())
    return ke0, _ke(state)


def test_hyperviscous_les_runs_and_dissipates_more():
    ke0_p, ke_plain = _run("compact6")
    ke0_h, ke_hyper = _run("compact6-hyperviscous")
    assert abs(ke0_p - ke0_h) < 1e-12      # identical ICs
    assert ke_hyper < ke0_h                # dissipative
    # the SVV closure adds dissipation on the noisy (high-k) content
    assert ke_hyper < ke_plain - 1e-9, (ke_plain, ke_hyper)
