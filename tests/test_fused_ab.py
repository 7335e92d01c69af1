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
