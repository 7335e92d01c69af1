#!/usr/bin/env python
"""Fused-vs-separate RK substage A/B on the real chip (VERDICT r3 #4).

Times the full RK3 TGV step (chunked, like production) with the fused
substage chain (make_fused_transeq_rk) and with the separate
transeq + rk_substage path, plus the AB3 step at the same size for
scale. Usage:  python tools/prof_rk.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase


def run(intg, fused):
    os.environ["X3D2_FUSED_RK"] = "1" if fused else "0"
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg=intg, dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                   verbose=False, keep_pressure=False)
    if intg.startswith("RK"):
        assert (case._fused_rk is not None) == fused, "gate mismatch"
    st = case.initial_state()
    st = case._chunk(st, iters)
    jax.block_until_ready(st["u"])
    t0 = time.perf_counter()
    st = case._chunk(st, iters)
    jax.block_until_ready(st["u"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    assert bool(jnp.isfinite(st["u"]).all())
    label = f"{intg} {'fused' if fused else 'separate'}"
    print(f"{label:28s} {ms:8.2f} ms/step", flush=True)
    return ms


ms_f = run("RK3", True)
ms_s = run("RK3", False)
print(f"RK3 fused-vs-separate speedup: {ms_s / ms_f:.3f}x")
run("AB3", True)
