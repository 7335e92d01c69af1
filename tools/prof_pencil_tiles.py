#!/usr/bin/env python
"""Free-dim tile sweep for the d2 (lane-axis) pencil sweep — the
largest single transeq kernel (~16 ms of the 512^3 step). The default
(4, 64) predates the 64 MB VMEM cap; bigger tiles mean fewer grid
steps and larger DMA chunks.

Usage: python tools/prof_pencil_tiles.py [n] [iters]
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
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_kernels import make_pencil_sweep

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
ns = NavierStokes.build(mesh, nu=1 / 1600, dtype=jnp.float32)
rng = np.random.default_rng(3)
u, v, w = (jnp.asarray(rng.standard_normal((n, n, n)) * 0.1, jnp.float32)
           for _ in range(3))


def loop_time(label, f, args):
    def looped(args):
        out = jax.lax.fori_loop(0, iters, lambda i, c: f(*c), args)
        return jnp.sum(out[0][0])

    g = jax.jit(looped)
    float(g(args))
    times = []
    for k in (2, 3):
        a = tuple(x * (1.0 + 1e-6 * k) for x in args)
        jax.block_until_ready(a[0])
        t0 = time.perf_counter()
        float(g(a))
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    print(f"{label:36s} {ms:8.2f} ms", flush=True)
    return ms


for free in ((4, 64), (8, 64), (4, 128), (8, 128), (16, 64), (2, 128)):
    try:
        d2 = make_pencil_sweep(ns.ops[2], ns.nu, 2, (n, n, n),
                               free=free, terms=2)
        loop_time(f"d2 pencil free={free}",
                  lambda a, b, c, d2=d2: d2(a, b, c), (u, v, w))
    except Exception as e:
        print(f"d2 pencil free={free} failed: "
              f"{type(e).__name__}: {e}"[:110], flush=True)
