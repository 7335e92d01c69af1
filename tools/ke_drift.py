#!/usr/bin/env python
"""KE-drift measurement: f32 TPU paths (plain vs Kahan-compensated state)
against the f64 CPU reference over a long TGV run.

Usage: python tools/ke_drift.py [n] [steps]
Prints relative KE deviation at checkpoints and the per-step drift rate.
(BASELINE.md north star: KE parity to 1e-6 over 20k steps, i.e. drift
<= 5e-11/step.)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
checkpoints = sorted({steps // 10, steps // 4, steps // 2, steps})

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase


def run(dtype, compensated, device=None, label=""):
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                          compensated=compensated)
    case = TGVCase(mesh, params, dtype=dtype, monitor_path=None,
                   verbose=False, keep_pressure=False)
    state = case.initial_state()
    if device is not None:
        state = jax.device_put(state, device)
        step = jax.jit(case.step_fn, donate_argnums=0, device=device)
    else:
        step = case._step
    kes = {}
    for it in range(1, steps + 1):
        state = step(state)
        if it in checkpoints:
            u, v, w = state["u"], state["v"], state["w"]
            kes[it] = float(0.5 * jnp.mean(
                u.astype(jnp.float64) * u.astype(jnp.float64)
                + v.astype(jnp.float64) * v.astype(jnp.float64)
                + w.astype(jnp.float64) * w.astype(jnp.float64))
                if dtype == jnp.float64 else
                0.5 * jnp.mean(u * u + v * v + w * w))
    print(f"{label}: done")
    return kes


jax.config.update("jax_enable_x64", True)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    ref = run(jnp.float64, False, label="f64 CPU reference")
plain = run(jnp.float32, False, label="f32 plain (TPU)")
comp = run(jnp.float32, True, label="f32 compensated (TPU)")

print(f"\n{'step':>6s} {'KE(f64)':>14s} {'plain rel.dev':>14s} "
      f"{'kahan rel.dev':>14s}")
for it in checkpoints:
    dp = abs(plain[it] - ref[it]) / ref[it]
    dc = abs(comp[it] - ref[it]) / ref[it]
    print(f"{it:6d} {ref[it]:14.10f} {dp:14.3e} {dc:14.3e}")
it = checkpoints[-1]
print(f"\nper-step drift: plain {abs(plain[it]-ref[it])/ref[it]/it:.2e}"
      f"  compensated {abs(comp[it]-ref[it])/ref[it]/it:.2e}"
      f"  (target <= 5e-11)")
