#!/usr/bin/env python
"""Species-transport RHS timings on the real chip: v3 kernel vs einsum.

Chained fori_loop timings (CLAUDE.md methodology) of
solver.transeq_species_all on both paths at a kernel-active size.

Usage:  python tools/prof_species.py [n] [nsp] [iters]
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
nsp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
nus = tuple(1 / 1600 / (0.7 + 0.1 * i) for i in range(nsp))
ns = NavierStokes.build(mesh, nu=1 / 1600, dtype=jnp.float32,
                        nu_species=nus)
rng = np.random.default_rng(3)
u, v, w = (jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
           for _ in range(3))
phi = jnp.asarray(rng.standard_normal((nsp, n, n, n)), jnp.float32)


def loop_time(label, f, args):
    def looped(args):
        out = jax.lax.fori_loop(
            0, iters, lambda i, c: (f(*c),) + c[1:], args)
        return jnp.sum(out[0][..., 0, 0, :][..., :8])

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
    print(f"{label:44s} {ms:8.2f} ms")
    return ms


have = getattr(ns, "_species_v3", None)
assert have is not None, "species v3 kernels not built (not on TPU?)"
# (the merged momentum+species chain was removed in round 4: measured
# 0.63x the standalone kernels on-chip in round 3)
ms_k = loop_time(f"species RHS x{nsp} (v3 kernels)",
                 lambda p, a, b, c: ns.transeq_species_all(p, a, b, c),
                 (phi, u, v, w))
object.__setattr__(ns, "_species_v3", None)
ms_e = loop_time(f"species RHS x{nsp} (einsum ops)",
                 lambda p, a, b, c: ns.transeq_species_all(p, a, b, c),
                 (phi, u, v, w))
object.__setattr__(ns, "_species_v3", have)
print(f"kernel-vs-einsum speedup: {ms_e / ms_k:.2f}x")
