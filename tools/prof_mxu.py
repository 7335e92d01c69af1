#!/usr/bin/env python
"""Decompose v3 transeq sweep cost: MXU passes vs fixed overhead.

terms=1 runs single-pass bf16 dots (1/3 the MXU work of terms=2 bf16x3);
if the sweep time doesn't drop ~3x the cost is overhead (DMA, VPU
concats/splits, issue latency), not MXU throughput.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_kernels import make_transeq_dir_v3

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32)
shape = (n, n, n)
key = jax.random.PRNGKey(0)
u, v, w = (jax.random.normal(k, shape, jnp.float32)
           for k in jax.random.split(key, 3))


def loop_time(label, f, args, flops=None):
    def looped(args):
        out = jax.lax.fori_loop(0, iters, lambda i, c: f(*c), args)
        return jnp.sum(out[0][0])

    g = jax.jit(looped)
    try:
        float(g(args))
    except Exception as e:
        print(f"{label:44s} FAILED {str(e)[:110]}", flush=True)
        return
    times = []
    for k in (2, 3):
        a = jax.tree_util.tree_map(lambda x: x * (1 + 1e-6 * k), args)
        jax.block_until_ready(a[0])
        t0 = time.perf_counter()
        float(g(a))
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    extra = f" {flops / ms * 1e-9:.1f} TF/s" if flops else ""
    print(f"{label:44s} {ms:8.2f} ms{extra}", flush=True)


def sweep(axis, label, **kw):
    try:
        d = make_transeq_dir_v3(ns.ops[axis], ns.nu, axis, shape,
                                accumulate=False, **kw)
    except Exception as e:
        print(f"{label:44s} BUILD-FAILED {str(e)[:90]}", flush=True)
        return
    win = 256 if axis == 2 else (64 + 2 * kw.get("w", 16))
    loop_time(label, lambda a, b, c: d(a, b, c), (u, v, w),
              flops=9 * 2 * win * n**3)


sweep(0, "d0 terms=2 free (32,128)", free=(32, 128))
sweep(0, "d0 terms=2 free (8,384) contiguous", free=(8, 384))
sweep(0, "d0 terms=2 free (16,384)", free=(16, 384))
sweep(1, "d1 terms=2 free (32,128)", free=(32, 128))
sweep(1, "d1 terms=2 free (8,384) contiguous", free=(8, 384))
sweep(2, "d2 terms=2 free (16,128)", free=(16, 128))
sweep(2, "d2 terms=2 free (4,128)", free=(4, 128))
