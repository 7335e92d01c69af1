#!/usr/bin/env python
"""Pressure-phase component breakdown on the real chip.

Times each piece of the production slab projection separately (the
prof512 numbers only cover the r3 k1/k2 split, not the merged mid
kernel or the six x-stage applies), so the VERDICT-r3 target
(pressure 30.7 -> ~20 ms at 512^3) can be attacked with data:

  - each x-stage apply kernel (sx, ix, gx_s_sub, gx_i_sub)
  - the merged mid kernel with and without the q output
  - the full pressure_correction chain (production path)

Bandwidth figures count read+write HBM passes (4 B/point each).

Usage:  python tools/prof_pressure.py [n] [iters]
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
slab = getattr(ns, "_slab_pressure", None)
assert slab is not None, "slab pressure not active at this size"
xk = slab[2]
mid = slab[3]

rng = np.random.default_rng(5)
u, v, w = (jnp.asarray(rng.standard_normal((n, n, n)) * 0.1, jnp.float32)
           for _ in range(3))


def loop_time(label, f, args, npasses=0):
    """Chained fori_loop timing with forced scalar readback that depends
    on the measured function's OUTPUT (a loop-invariant readback gets
    DCE'd and times nothing — CLAUDE.md methodology)."""
    def looped(args):
        out = jax.lax.fori_loop(0, iters, lambda i, c: f(*c), args)
        leaf = next(x for x in jax.tree_util.tree_leaves(out)
                    if getattr(x, "ndim", 0) == 3)
        return jnp.sum(leaf[0])

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
    extra = ""
    if npasses:
        extra = f" {npasses * n**3 * 4 / ms * 1e-6:6.0f} GB/s(r+w)"
    print(f"{label:40s} {ms:8.2f} ms{extra}")
    return ms


# --- x-stage kernels (chained through their own output) ---------------
ms_sx = loop_time("x div apply sx (1r+1w)",
                  lambda f: (xk["sx"](f),), (u,), npasses=2)
loop_time("x div apply ix (1r+1w)", lambda f: (xk["ix"](f),), (v,),
          npasses=2)
# grad+correction: read spectral f, read s, write s - M@f
ms_gx = loop_time("x grad+sub gx_s (2r+1w)",
                  lambda f, s: (xk["gx_s_sub"](f, s), s), (u, v),
                  npasses=3)
loop_time("x grad+sub gx_i (2r+1w)",
          lambda f, s: (xk["gx_i_sub"](f, s), s), (u, v), npasses=3)

# --- mid kernel --------------------------------------------------------
def mid_nq(a, b, c):
    outs = mid.no_q(a, b, c)
    return outs


ms_mid = loop_time("mid merged no-q (3r+3w)", mid_nq, (u, v, w),
                   npasses=6)
loop_time("mid merged with q (3r+4w)", lambda a, b, c: mid(a, b, c)[1:],
          (u, v, w), npasses=7)
k1, k2 = slab[0], slab[1]
loop_time("  k1 separate (3r+1w)", lambda a, b, c: (k1(a, b, c), b, c),
          (u, v, w), npasses=4)
loop_time("  k2 separate (1r+3w)", lambda q: (k2(q)[0],), (u,),
          npasses=4)

# grad WITHOUT the fused subtract (isolates the extra s-read cost)
from x3d2_tpu.ops.pallas_poisson import make_x_apply
d64 = ns._fp_mats64()
gx_nosub = make_x_apply(d64["gx_i"], terms=2, parity="inv")
loop_time("x grad plain gx_i (1r+1w)", lambda f: (gx_nosub(f),), (u,),
          npasses=2)

# --- merged 3-field x-stage kernels ------------------------------------
if "div3" in xk:
    loop_time("x div3 merged (3r+3w)",
              lambda a, b, c: xk["div3"](a, b, c), (u, v, w), npasses=6)
    loop_time("x gradsub3 merged (6r+3w)",
              lambda a, b, c: xk["gradsub3"](a, b, c, a, b, c),
              (u, v, w), npasses=9)

# --- full production chain --------------------------------------------
ms_full = loop_time(
    "pressure_correction no-p (18 passes)",
    lambda a, b, c: ns.pressure_correction(a, b, c,
                                           keep_pressure=False)[:3],
    (u, v, w), npasses=18)

print(f"\nx-stages total (3 div + 3 grad): "
      f"{3 * ms_sx + 3 * ms_gx:.2f} ms (approx)")
print(f"glue = full - mid - x-stages: "
      f"{ms_full - ms_mid - 3 * ms_sx - 3 * ms_gx:.2f} ms")
