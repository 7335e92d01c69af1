#!/usr/bin/env python
"""A/B: chunked full step with 1-step vs m-step-unrolled fori body.

Usage: python tools/time_chunk.py [n] [iters] [unroll]
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
unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 1

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
               verbose=False, keep_pressure=False)


def body(i, s):
    for _ in range(unroll):
        s = case.step_fn(s)
    return s


def _chunk(state):
    return jax.lax.fori_loop(0, iters // unroll, body, state)


chunk = jax.jit(_chunk, donate_argnums=0)


state = case.initial_state()
print(f"n={n} iters={iters} unroll={unroll}", flush=True)
state = chunk(state)
jax.block_until_ready(state["u"])
for _ in range(3):
    t0 = time.perf_counter()
    state = chunk(state)
    jax.block_until_ready(state["u"])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  full step: {dt:.2f} ms", flush=True)
