#!/usr/bin/env python
"""KE-drift measurement: f32 TPU paths (plain vs Kahan-compensated state)
against the f64 CPU reference over a long TGV run.

Usage: python tools/ke_drift.py [n] [steps]
Prints relative KE deviation at checkpoints and the per-step drift rate.
(BASELINE.md north star: KE parity to 1e-6 over 20k steps, i.e. drift
<= 5e-11/step.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

# single int for a cubic grid, or "nx,ny,nz" (e.g. 128,128,256 — the
# smallest shape where the v3/slab Pallas kernels are active)
_arg = sys.argv[1] if len(sys.argv) > 1 else "64"
dims = tuple(int(x) for x in _arg.split(","))
if len(dims) == 1:
    dims = dims * 3
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
checkpoints = sorted({steps // 10, steps // 4, steps // 2, steps})

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase


def run(dtype, compensated, device=None, label=""):
    mesh = Mesh(dims, (2 * np.pi,) * 3,
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
            # KE reduced host-side in f64: an on-device f32 mean has
            # ~1e-7 noise, far above the compensated drift target
            u = np.asarray(state["u"]).astype(np.float64)
            v = np.asarray(state["v"]).astype(np.float64)
            w = np.asarray(state["w"]).astype(np.float64)
            kes[it] = 0.5 * float((u * u + v * v + w * w).mean())
    print(f"{label}: done")
    return kes


jax.config.update("jax_enable_x64", True)
cpu = jax.devices("cpu")[0]
# the f64 CPU reference is ~25 min at kernel-active sizes: cache it
_ck = f"/tmp/ke_ref_{'x'.join(map(str, dims))}_{steps}.npz"
if os.path.exists(_ck):
    _d = np.load(_ck)
    ref = {int(k): float(_d[k]) for k in _d.files}
    print("f64 CPU reference: cached")
else:
    with jax.default_device(cpu):
        ref = run(jnp.float64, False, label="f64 CPU reference")
    np.savez(_ck, **{str(k): v for k, v in ref.items()})
# x64 off for the f32 TPU legs (Pallas kernel tracing recurses with
# x64-widened index-map constants)
jax.config.update("jax_enable_x64", False)
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
