#!/usr/bin/env python
"""A/B the production pressure chain under the round-4 experiment
gates: X3D2_MID_SPLIT (k1+k2 separate pallas_calls vs the merged mid
kernel — separate kernels re-add the q HBM round-trip but overlap each
other's DMA/compute) and X3D2_DIMSEM (parallel dimension semantics on
the 1-D slab grids). Both gates are read at trace time, so one solver
serves all four combinations.

Usage:  python tools/prof_pressure_ab.py [n] [iters]
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

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
ns = NavierStokes.build(mesh, nu=1 / 1600, dtype=jnp.float32)
assert getattr(ns, "_slab_pressure", None) is not None

rng = np.random.default_rng(5)
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
    print(f"{label:52s} {ms:8.2f} ms", flush=True)
    return ms


def chain(a, b, c):
    return ns.pressure_correction(a, b, c, keep_pressure=False)[:3]


if os.environ.get("X3D2_AB_GATES", "1") != "0":
    for split in ("0", "1"):
        for dimsem in ("0", "1"):
            os.environ["X3D2_MID_SPLIT"] = split
            os.environ["X3D2_DIMSEM"] = dimsem
            loop_time(f"pressure chain split={split} dimsem={dimsem}",
                      chain, (u, v, w))
    os.environ["X3D2_MID_SPLIT"] = "0"
    os.environ["X3D2_DIMSEM"] = "0"

if os.environ.get("X3D2_AB_PIPE3", "0") == "1":
    from x3d2_tpu.ops.pallas_poisson import make_pressure_pipe3
    pipe = getattr(ns, "_pipe_pressure", None) or make_pressure_pipe3(
        ns, terms=2)
    object.__setattr__(ns, "_pipe_pressure", None)
    loop_time("pressure chain (x-first, div3/mid/gradsub3)",
              chain, (u, v, w))
    loop_time("pressure pipe3 (A/B/C)",
              lambda a, b, c: pipe(a, b, c), (u, v, w))
    loop_time("  pipe3 A (slab div y/z)",
              lambda a, b, c: pipe.a_fn(a, b, c) + (c,), (u, v, w))
    loop_time("  pipe3 B (x + solve + x)",
              lambda a, e: pipe.b_fn(a, e), (u, v))
    def c_rung(X, Y, a, b, c):
        un, vn, wn = pipe.c_fn(X, Y, a, b, c)
        return un, vn, a, b, wn   # outputs feed the next iteration

    loop_time("  pipe3 C (grad z/y + corr)", c_rung, (u, v, u, v, w))
    try:
        pipe16 = make_pressure_pipe3(ns, terms=2, t1=16)
        loop_time("pressure pipe3 t1=16",
                  lambda a, b, c: pipe16(a, b, c), (u, v, w))
    except Exception as e:
        print(f"pipe3 t1=16 failed: {type(e).__name__}: {e}"[:120],
              flush=True)

if os.environ.get("X3D2_AB_TILES", "0") == "1":
    # free-dim tile sweep on the merged x kernels (isolated + in a
    # div3->gradsub3 chained pair, the closest cheap proxy to in-chain)
    from x3d2_tpu.ops.pallas_poisson import make_x_div3, make_x_gradsub3
    d64 = ns._fp_mats64()
    for t1 in (8, 16):
        for t2 in (128, 256):
            d3 = make_x_div3(d64["sx"], d64["ix"], terms=2, t1=t1, t2=t2)
            g3 = make_x_gradsub3(d64["gx_s"], d64["gx_i"], terms=2,
                                 t1=t1, t2=t2)
            loop_time(f"div3 t1={t1} t2={t2}",
                      lambda a, b, c, d3=d3: d3(a, b, c), (u, v, w))
            loop_time(f"div3+gradsub3 pair t1={t1} t2={t2}",
                      lambda a, b, c, d3=d3, g3=g3:
                      g3(*d3(a, b, c), a, b, c), (u, v, w))
