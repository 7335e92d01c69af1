"""Fused transeq+AB kernel chain vs separate v3 transeq + ab_step.

Both variants run the same v3 Pallas sweeps (interpret mode), so the
comparison isolates the in-kernel Adams-Bashforth update (including the
startup coefficient rows) against time_integrators.ab_step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.ops.pallas_kernels import (make_fused_transeq_ab_v3,
                                         make_fused_transeq_v3)

# lane-axis sweeps need n >= 256 (bs=128, w=64 rolled windows)
SHAPE = (128, 128, 256)


def _case(time_intg="AB3"):
    mesh = Mesh(SHAPE, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg=time_intg, dt=1e-3)
    return TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                   verbose=False, keep_pressure=False)


@pytest.mark.parametrize("order", [2, 3])
def test_fused_ab_matches_separate(order):
    intg = f"AB{order}"
    ca = _case(intg)
    cb = _case(intg)
    shape = SHAPE
    nu = ca.solver.nu
    # same v3 kernels on both; only the AB update location differs
    v3 = make_fused_transeq_v3(ca.solver.ops, nu, shape, interpret=True)
    object.__setattr__(ca.solver, "_transeq_v3", v3)
    assert ca._fused_ab is None
    fused = make_fused_transeq_ab_v3(cb.solver.ops, nu, shape,
                                     nolds=order - 1, interpret=True)
    cb._fused_ab = fused

    sa = ca.initial_state()
    sb = cb.initial_state()
    sa = ca.step_fn(sa)
    sb = cb.step_fn(sb)
    # step 1: identical inputs, so the rhs written by the fused kernel
    # (the new history head) must match the separate transeq+ab_step up
    # to the tiling-order noise of the reconfigured final sweep
    for oa, ob in zip(sa["olds"], sb["olds"]):
        scale = float(jnp.max(jnp.abs(oa[0]))) + 1e-30
        err = float(jnp.max(jnp.abs(oa[0] - ob[0])))
        assert err < 1e-5 * scale, f"rhs head: {err:.2e} vs {scale:.2e}"
    for _ in range(2):  # covers the AB startup rows (istep 2..3)
        sa = ca.step_fn(sa)
        sb = cb.step_fn(sb)
    for k in ("u", "v", "w"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        assert err < 1e-5, f"{k}: {err:.2e}"


def test_fused_ab_with_species_matches_separate():
    """Species-active fused-AB step (momentum in-kernel AB + phi XLA AB
    on the standalone v3 species-sweep RHS) vs the separate
    transeq + ab_step path over all four variables, covering the AB3
    startup rows."""
    def _sp_case():
        mesh = Mesh(SHAPE, (2 * np.pi,) * 3,
                    ((BC.PERIODIC, BC.PERIODIC),) * 3)
        params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                              n_species=1, pr_species=(0.7,))
        return TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                       verbose=False, keep_pressure=False)

    from x3d2_tpu.ops.pallas_kernels import make_fused_species_v3
    ca = _sp_case()
    cb = _sp_case()
    nu = ca.solver.nu
    v3 = make_fused_transeq_v3(ca.solver.ops, nu, SHAPE, interpret=True)
    spk = make_fused_species_v3(ca.solver.ops, ca.solver.nu_species,
                                SHAPE, interpret=True)
    for c in (ca, cb):
        object.__setattr__(c.solver, "_transeq_v3", v3)
        object.__setattr__(c.solver, "_species_v3", spk)
    assert ca._fused_ab is None
    cb._fused_ab = make_fused_transeq_ab_v3(cb.solver.ops, nu, SHAPE,
                                            nolds=2, interpret=True)
    sa = ca.initial_state()
    sb = cb.initial_state()
    sa = ca.step_fn(sa)
    sb = cb.step_fn(sb)
    # step 1: identical inputs — the history head for every variable
    # (incl. phi) must rotate alike up to kernel tiling-order noise
    for oa, ob in zip(sa["olds"], sb["olds"]):
        scale = float(jnp.max(jnp.abs(oa[0]))) + 1e-30
        err = float(jnp.max(jnp.abs(oa[0] - ob[0])))
        assert err < 1e-5 * scale, f"olds head: {err:.2e}"
    for _ in range(2):  # covers the AB3 startup rows
        sa = ca.step_fn(sa)
        sb = cb.step_fn(sb)
    uscale = float(jnp.max(jnp.abs(sa["u"])))  # w starts near 0 in TGV
    for k in ("u", "v", "w", "phi"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        assert err < 1e-5 * uscale, f"{k}: {err:.2e} vs {uscale:.2e}"


def test_fused_ab_xdiv_chain():
    """The AB+xdiv pencil chain (final sweep emits the projection's
    x-transformed divergence inputs) matches the plain fused-AB chain on
    velocities/rhs, and its div outputs match a f64 parity-split apply
    of its own updated velocities."""
    import jax
    from x3d2_tpu.ops.pallas_poisson import parity_split_folded

    ca = _case("AB3")
    shape = SHAPE
    nu = ca.solver.nu
    d64 = ca.solver._fp_mats64()
    f_plain = make_fused_transeq_ab_v3(ca.solver.ops, nu, shape,
                                       nolds=2, interpret=True)
    f_x = make_fused_transeq_ab_v3(ca.solver.ops, nu, shape, nolds=2,
                                   interpret=True,
                                   xdiv=(d64["sx"], d64["ix"]))
    st = ca.initial_state()
    u, v, w = st["u"], st["v"], st["w"]
    key = jax.random.PRNGKey(0)
    olds = tuple(
        tuple(0.1 * jax.random.normal(jax.random.fold_in(key, 10 * c + j),
                                      shape, jnp.float32)
              for j in range(2))
        for c in range(3))
    dtc = jnp.asarray([1e-3, -5e-4, 2e-4], jnp.float32)
    (ua, va, wa), rhs_a = f_plain(u, v, w, olds, dtc)
    (ux, vx, wx), rhs_x, divs = f_x(u, v, w, olds, dtc)
    for a, b, nm in ((ua, ux, "u"), (va, vx, "v"), (wa, wx, "w"),
                     (rhs_a[0], rhs_x[0], "rhs_u"),
                     (rhs_a[2], rhs_x[2], "rhs_w")):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 2e-5 * scale, f"{nm}: {err:.2e} vs {scale:.2e}"
    # div outputs: block-parity-ordered forward transforms of u',v',w'
    h = shape[0] // 2
    sl = (slice(None), slice(0, 4), slice(None))  # thin y slab, f64 cost
    for M64, fld, dv, nm in ((d64["sx"], ux, divs[0], "du"),
                             (d64["ix"], vx, divs[1], "dv"),
                             (d64["ix"], wx, divs[2], "dw")):
        Me, Mo = parity_split_folded(np.asarray(M64, np.float64), 0)
        F = np.asarray(fld, np.float64)[sl]
        exp = np.concatenate([
            np.einsum("ab,byz->ayz", Me, F[:h] + F[h:]),
            np.einsum("ab,byz->ayz", Mo, F[:h] - F[h:])], axis=0)
        got = np.asarray(dv, np.float64)[sl]
        scale = np.abs(exp).max() + 1e-30
        err = np.abs(exp - got).max()
        # bf16x3 noise on the large-row-norm transform-folded derivative
        # matrices (~1e-4 rel; same bound as the slab-kernel tests)
        assert err < 2e-4 * scale, f"{nm}: {err:.2e} vs {scale:.2e}"


@pytest.mark.parametrize("order", [2, 3, 4])
def test_fused_rk_matches_separate(order):
    """Fused RK substage chain (make_fused_transeq_rk: the substage
    update runs in-kernel with a separate f0 base stream) vs the same
    v3 transeq + time_integrators.rk_substage, across all substages and
    two full steps (time_integrator.f90:166-231 tableaus)."""
    from x3d2_tpu.ops.pallas_kernels import make_fused_transeq_rk
    intg = f"RK{order}"
    ca = _case(intg)
    cb = _case(intg)
    shape = SHAPE
    nu = ca.solver.nu
    v3 = make_fused_transeq_v3(ca.solver.ops, nu, shape, interpret=True)
    object.__setattr__(ca.solver, "_transeq_v3", v3)
    assert ca._fused_rk is None   # CPU build leaves the gate cold
    cb._fused_rk = make_fused_transeq_rk(cb.solver.ops, nu, shape,
                                         order, interpret=True)

    sa = ca.initial_state()
    sb = cb.initial_state()
    for _ in range(2):
        sa = ca.step_fn(sa)
        sb = cb.step_fn(sb)
    for k in ("u", "v", "w"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        assert err < 1e-5, f"{k}: {err:.2e}"


def test_d2c_carry_matches_standard_chain():
    """The d2-in-C carry (projection kernel C also emits the next
    step's z-sweep partials; the AB chain starts at d0) must reproduce
    the standard d2->d0->d1+AB + pipe3 step over several steps,
    including the AB3 startup rows."""
    from x3d2_tpu.ops.pallas_kernels import (_make_sweep,
                                             make_fused_transeq_ab_v3)
    from x3d2_tpu.ops.pallas_poisson import make_pressure_pipe3
    import jax

    ca = _case("AB3")
    ca.keep_pressure = False
    cb = _case("AB3")
    cb.keep_pressure = False
    nu = ca.solver.nu
    fused = make_fused_transeq_ab_v3(ca.solver.ops, nu, SHAPE, nolds=2,
                                     interpret=True)
    pipe = make_pressure_pipe3(ca.solver, terms=2, interpret=True)
    ca._fused_ab = fused
    object.__setattr__(ca.solver, "_pipe_pressure", pipe)

    cb._fused_ab = fused   # used only until rhsp exists (never here)
    cb._pipe_d2c = make_pressure_pipe3(cb.solver, terms=2,
                                       interpret=True, d2_sweep=True)
    cb._fused_ab_nod2 = make_fused_transeq_ab_v3(
        cb.solver.ops, nu, SHAPE, nolds=2, interpret=True, skip_d2=True)
    cb._d2_boot = jax.jit(_make_sweep(cb.solver.ops[2], nu, 2, SHAPE,
                                      2, True, {}))

    sa = ca.initial_state()
    sb = cb.initial_state()
    assert "rhsp" in sb   # bootstrapped by initial_state
    for _ in range(3):
        sa = ca.step_fn(sa)
        sb = cb.step_fn(sb)
    assert "rhsp" in sb
    uscale = float(jnp.max(jnp.abs(sa["u"])))
    for k in ("u", "v", "w"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        assert err < 2e-5 * uscale, f"{k}: {err:.2e} vs {uscale:.2e}"
    for oa, ob in zip(sa["olds"], sb["olds"]):
        err = float(jnp.max(jnp.abs(oa[0] - ob[0])))
        assert err < 2e-4, f"olds: {err:.2e}"
