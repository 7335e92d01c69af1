#!/usr/bin/env python
"""Component-level wall-clock breakdown on the real chip.

Timing methodology (CLAUDE.md): each measured function runs `iters`
chained applications inside ONE jitted lax.fori_loop, and completion is
forced by a scalar readback — host-level loops through the axon relay
can both add ms-scale eager overhead and report bogus 0.00 ms times.

Usage:  python tools/prof512.py [n] [iters]

Note: each timed call pays ~30 ms of relay round-trip, amortised over
`iters` — numbers at small n carry a ~30/iters ms floor; use iters>=20
and trust relative comparisons at n>=512.
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
from x3d2_tpu.ops.compact import apply_matrix

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
               verbose=False, keep_pressure=False)
ns = case.solver
state = case.initial_state()
u, v, w = state["u"], state["v"], state["w"]


def loop_time(label, f, args, flops=None, nbytes=None):
    """Chained fori_loop timing with forced scalar readback."""
    def looped(args):
        out = jax.lax.fori_loop(0, iters, lambda i, c: f(*c), args)
        leaf = next(x for x in jax.tree_util.tree_leaves(out)
                    if getattr(x, "ndim", 0) == 3)
        return jnp.sum(leaf[0])  # contiguous-plane readback (cheap)

    def perturb(x, k):
        # bust potential relay result caching without touching PRNG keys
        if getattr(x, "ndim", 0) == 3 and jnp.issubdtype(x.dtype,
                                                         jnp.floating):
            return x * (1.0 + 1e-6 * k)
        return x

    g = jax.jit(looped)
    float(g(args))  # compile + warm
    times = []
    for k in (2, 3):
        a = jax.tree_util.tree_map(lambda x: perturb(x, k), args)
        jax.block_until_ready(jax.tree_util.tree_leaves(a)[0])
        t0 = time.perf_counter()
        float(g(a))
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    extra = ""
    if flops:
        extra += f" {flops / ms * 1e-9:.1f} TF/s"
    if nbytes:
        extra += f" {nbytes / ms * 1e-6:.0f} GB/s"
    print(f"{label:44s} {ms:8.2f} ms{extra}")
    return ms


nb3 = n**3 * 4
loop_time("XLA elementwise x+eps*x*x (r+w)",
          lambda x: (x + 1e-7 * x * x,), (u,), nbytes=2 * nb3)

M = jnp.asarray(np.random.randn(n, n) / n, jnp.float32)
for ax in range(3):
    loop_time(f"dense apply axis {ax}",
              lambda f, ax=ax: (apply_matrix(M, f, ax),),
              (u,), flops=2 * n**4)

# transeq: flop model depends on the active path
if getattr(ns, "_transeq_v3", None) is not None:
    # v3 banded windows: 96 planes on axes 0/1, 256 on the lane axis
    tr_flops = 9 * 2 * (96 + 96 + 256) * n**3
    tr_label = "transeq (v3 banded pallas)"
else:
    tr_flops = 27 * 2 * n**4
    tr_label = "transeq (einsum dense)"
loop_time(tr_label, lambda a, b, c: ns.transeq(a, b, c), (u, v, w),
          flops=tr_flops)

saved = getattr(ns, "_transeq_v3", None)
if saved is not None:
    object.__setattr__(ns, "_transeq_v3", None)
    loop_time("transeq (einsum dense)",
              lambda a, b, c: ns.transeq(a, b, c), (u, v, w),
              flops=27 * 2 * n**4)
    object.__setattr__(ns, "_transeq_v3", saved)

slab = getattr(ns, "_slab_pressure", None)
plabel = "pressure_correction (%s)" % ("slab pallas" if slab else
                                       "fused dense")
loop_time(plabel,
          lambda a, b, c: ns.pressure_correction(
              a, b, c, keep_pressure=False)[:3],
          (u, v, w), flops=16 * 2 * n**4)
if slab is not None:
    k1, k2 = slab[0], slab[1]
    loop_time("  slab k1 (div y/z + solve)",
              lambda a, b, c: (k1(a, b, c), b, c),
              (u, v, w), flops=5 * 2 * n**4)
    loop_time("  slab k2 (grad z/y)", lambda q: (k2(q)[0],), (u,),
              flops=5 * 2 * n**4)
loop_time("matmul poisson solve",
          lambda p: (ns.poisson(p),), (u,), flops=6 * 2 * n**4)

# AB3 update + zero-copy rotation (traffic model: 12 reads + 3 writes)
olds = state["olds"]


def ab_once(a, b, c, o):
    fields, new_olds = case.ti.ab_step(
        (a, b, c), o, jnp.asarray(5, jnp.int32),
        (a * 0.1, b * 0.1, c * 0.1), 1e-3)
    return fields + (new_olds,)


loop_time("AB3 update + rotate", ab_once, (u, v, w, olds),
          nbytes=15 * nb3)

# full step (chained through its own state). The loop is jitted WITH
# donation: the fused transeq+AB kernel aliases dead history buffers onto
# its outputs, which XLA must otherwise satisfy with defensive copies
# (observed as RESOURCE_EXHAUSTED at 512^3 in the undonated harness).


def full_step_time():
    def looped(s):
        out = jax.lax.fori_loop(0, iters, lambda i, c: case.step_fn(c), s)
        return jnp.sum(out["u"][0])

    g = jax.jit(looped, donate_argnums=0)
    float(g(case.initial_state()))  # compile + warm on a fresh state
    times = []
    for _ in range(2):
        s = case.initial_state()
        jax.block_until_ready(s["u"])
        t0 = time.perf_counter()
        float(g(s))
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    print(f"{'full step':44s} {ms:8.2f} ms")


# free the component-timing buffers first: at 512^3 the module-level
# state + u,v,w + olds (~6 GB) alongside TWO live step states inside the
# timing loop exhausts the 16 GB HBM (observed RESOURCE_EXHAUSTED)
del u, v, w, olds, state
full_step_time()
