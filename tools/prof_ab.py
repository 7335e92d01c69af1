#!/usr/bin/env python
"""Surgical timing of the fused transeq+AB final sweep variants.

Readback note: the summed leaf must depend on the kernel under test or
XLA dead-code-eliminates the whole chain (a 1.2 ms "timing" of a 10 ms
kernel was measured before this was fixed).
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
acc = (u * 0.1, v * 0.1, w * 0.1)
olds = tuple((q * 0.01, q * 0.02) for q in (u, v, w))
dtc = 1e-3 * jnp.asarray([23 / 12, -4 / 3, 5 / 12, 0], jnp.float32)


def loop_time(label, f, args):
    def looped(args):
        out = jax.lax.fori_loop(0, iters, lambda i, c: f(*c), args)
        # sum a leaf that the kernel WROTE (out[0] must be kernel output)
        return jnp.sum(out[0][0])

    g = jax.jit(looped)
    try:
        float(g(args))
    except Exception as e:
        print(f"{label:46s} FAILED {str(e)[:120]}")
        return
    times = []
    for k in (2, 3):
        a = jax.tree_util.tree_map(
            lambda x: x * (1 + 1e-6 * k) if getattr(x, "ndim", 0) == 3
            else x, args)
        jax.block_until_ready(jax.tree_util.tree_leaves(a)[0])
        t0 = time.perf_counter()
        float(g(a))
        times.append(time.perf_counter() - t0)
    print(f"{label:46s} {min(times) / iters * 1e3:8.2f} ms", flush=True)


d1_plain = make_transeq_dir_v3(ns.ops[1], ns.nu, 1, shape, accumulate=True)
# chain: outputs become next acc; u,v,w fixed via closure
loop_time("d1 unfused (free 16,128)",
          lambda x, y, z: d1_plain(u, v, w, acc=(x, y, z)), acc)


def run_fused(label, **kw):
    d1 = make_transeq_dir_v3(ns.ops[1], ns.nu, 1, shape, accumulate=True,
                             ab_olds=2, **kw)

    def fab(un, vn, wn, o):
        # chain through the updated velocities and rotated history
        (u2, v2, w2), rhs = d1(un, vn, wn, acc=(un * 0.1, vn * 0.1,
                                                wn * 0.1), olds=o, dtc=dtc)
        return (u2, v2, w2, tuple((r,) + oo[:-1] for r, oo in zip(rhs, o)))

    loop_time(label, fab, (u, v, w, olds))


run_fused("d1 AB-fused alias-all (free 8,128)")
run_fused("d1 AB-fused acc-alias only (free 8,128)", ab_alias=False)
run_fused("d1 AB-fused alias-all (free 16,128)", free=(16, 128))
run_fused("d1 AB-fused acc-alias (free 16,128)", ab_alias=False,
          free=(16, 128))

# separate AB step for comparison
from x3d2_tpu.time_integrators import TimeIntegrator
ti = TimeIntegrator("AB3")


def ab_only(a, b, c, o):
    fields, new_olds = ti.ab_step((a, b, c), o, jnp.asarray(5, jnp.int32),
                                  (a * 0.1, b * 0.1, c * 0.1), 1e-3)
    return fields + (new_olds,)


loop_time("AB step alone", ab_only, (u, v, w, olds))
