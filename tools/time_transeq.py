#!/usr/bin/env python
"""Time the v3 Pallas transeq alone at n^3 (chained fori_loop readback).

Usage: [X3D2_DIMSEM=1] python tools/time_transeq.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.ops.pallas_kernels import make_fused_transeq_v3

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
               verbose=False, keep_pressure=False)
ns = case.solver
state = case.initial_state()
u, v, w = state["u"], state["v"], state["w"]

f = make_fused_transeq_v3(ns.ops, 1.0 / 1600.0, (n, n, n))


def looped(args):
    out = jax.lax.fori_loop(0, iters, lambda i, c: f(*c), args)
    return jnp.sum(out[0][0])


g = jax.jit(looped)
print("dimsem:", os.environ.get("X3D2_DIMSEM", "0"), flush=True)
float(g((u, v, w)))
for k in (2, 3, 4):
    a = tuple(q * (1.0 + 1e-6 * k) for q in (u, v, w))
    jax.block_until_ready(a[0])
    t0 = time.perf_counter()
    float(g(a))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  transeq v3 {n}^3: {dt:.2f} ms", flush=True)
