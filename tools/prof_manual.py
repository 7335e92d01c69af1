#!/usr/bin/env python
"""Grid-pipelined vs manual-DMA x-apply on the real chip.

The adoption decision for ops/pallas_manual.py: if the manual S-slot
pipeline beats the Mosaic grid kernels (which cap at ~260 GB/s) on the
production x-stage shapes, wire it behind X3D2_MANUAL_XAPPLY and extend
the approach to the sweep kernels. Timing per CLAUDE.md methodology
(chained fori_loop, scalar readback).

Usage: python tools/prof_manual.py [n] [iters]   (relay must be up)
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

from x3d2_tpu.ops.matmul_poisson import real_dft_matrix
from x3d2_tpu.ops.pallas_poisson import make_x_apply
from x3d2_tpu.ops.pallas_manual import make_x_apply_manual

rng = np.random.default_rng(0)
sten = rng.standard_normal(5)
Op = np.zeros((n, n))
for k, c in zip(range(-2, 3), sten):
    Op += c * np.roll(np.eye(n), k, axis=1)
T = real_dft_matrix(n)
Mf, Mi = T @ Op, Op @ np.linalg.inv(T)
# normalise so chained applications stay finite
Mf /= np.abs(np.linalg.eigvals(Mf)).max()
Mi /= np.abs(np.linalg.eigvals(Mi)).max()

x = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)


def loop_time(label, f, args, nbytes):
    def looped(args):
        out = jax.lax.fori_loop(0, iters, lambda i, c: (f(*c),) + c[1:],
                                args)
        return jnp.sum(out[0][0])

    try:
        g = jax.jit(looped)
        float(g(args))
        times = []
        for k in (2, 3):
            a = tuple(t * (1.0 + 1e-6 * k) for t in args)
            jax.block_until_ready(a[0])
            t0 = time.perf_counter()
            float(g(a))
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1e3
        print(f"{label:28s} {ms:8.2f} ms  {nbytes / ms * 1e-6:7.0f} GB/s")
        return ms
    except Exception as e:
        print(f"{label:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None


nb = 2 * n**3 * 4
nb_sub = 3 * n**3 * 4

for label, M, kw, args, b in [
        ("dense", Mf, {}, (x,), nb),
        ("dense sub", Mf, dict(sub=True), (x, x), nb_sub),
        ("parity fwd", Mf, dict(parity="fwd"), (x,), nb),
        ("parity inv", Mi, dict(parity="inv"), (x,), nb),
        ("parity inv sub", Mi, dict(parity="inv", sub=True), (x, x),
         nb_sub)]:
    loop_time(f"grid  {label}", make_x_apply(M, terms=2, **kw), args, b)
    for slots in (3, 4, 6):
        loop_time(f"manual[S={slots}] {label}",
                  make_x_apply_manual(M, terms=2, slots=slots, **kw),
                  args, b)
# tile-shape sensitivity on the winner candidate
for t2 in (128, 256, n):
    loop_time(f"manual[S=4,t2={t2}] dense",
              make_x_apply_manual(Mf, terms=2, slots=4, t2=t2), (x,), nb)
