#!/usr/bin/env python
"""Component-level wall-clock breakdown on the real chip.

Each timed function is jitted whole and chained through its own output
(relay caching lies for unchained loops — CLAUDE.md). Usage:

    python tools/prof512.py [n] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase

mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
               verbose=False, keep_pressure=False)
ns = case.solver
state = case.initial_state()
u, v, w = state["u"], state["v"], state["w"]


def timeit(label, fn, args, chain, flops=None):
    """fn jitted; `chain(out, args) -> args` feeds output back in."""
    try:
        return _timeit(label, fn, args, chain, flops)
    except jax.errors.JaxRuntimeError as e:
        print(f"{label:42s}    OOM/err: {str(e)[:60]}")
        return None


def _timeit(label, fn, args, chain, flops=None):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    args2 = chain(out, args)
    t0 = time.perf_counter()
    a = args2
    for _ in range(iters):
        o = f(*a)
        a = chain(o, a)
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    tf = f" {flops / ms * 1e-9:.1f} TF/s" if flops else ""
    print(f"{label:42s} {ms:8.2f} ms{tf}")
    return ms


def chain3(out, args):
    # chain only through the first arg to keep peak memory low
    return (args[0] + 1e-12 * out[0],) + args[1:]


# transeq (current path: pallas if enabled)
timeit("transeq (current)", ns.transeq, (u, v, w), chain3,
       flops=27 * 2 * n * n**3 * (256 / n if max(n, 256) > 256 else 1))

# transeq pure einsum
saved = {a: getattr(ns, a, None)
         for a in ("_pallas_transeq", "_transeq_v3")}
for a in saved:
    object.__setattr__(ns, a, None)
timeit("transeq (einsum dense)", ns.transeq, (u, v, w), chain3,
       flops=27 * 2 * n**4)
for a, val in saved.items():
    object.__setattr__(ns, a, val)

# pressure correction (fused dense)
timeit("pressure_correction (fused dense)",
       lambda a, b, c: ns.pressure_correction(a, b, c, keep_pressure=False),
       (u, v, w), chain3,
       flops=16 * 2 * n**4)

# poisson solve alone (matmul)
p0 = jnp.zeros(mesh.global_cell_dims, jnp.float32)
timeit("matmul poisson solve", ns.poisson, (p0 + 1e-3,),
       lambda o, a: (o,), flops=6 * 2 * n**4)

# fft poisson solve alone
from x3d2_tpu.ops.fft_poisson import SpectralPoisson
fp = SpectralPoisson(mesh, ns.ops, dtype=jnp.float32)
timeit("fft poisson solve", fp, (p0 + 1e-3,), lambda o, a: (o,))

# raw dense matmul rate per axis
M = jnp.asarray(np.random.randn(n, n) / n, jnp.float32)
from x3d2_tpu.ops.compact import apply_matrix
for ax in range(3):
    timeit(f"dense apply axis {ax}",
           lambda f, M=M, ax=ax: apply_matrix(M, f, ax),
           (u,), lambda o, a: (o,), flops=2 * n**4)

# AB3 integrator update alone
olds = state["olds"]
timeit("AB3 update + rotate",
       lambda u, v, w, olds: case.ti.ab_step(
           (u, v, w), olds, jnp.asarray(5, jnp.int32),
           (u * 0.1, v * 0.1, w * 0.1), 1e-3),
       (u, v, w, olds),
       lambda o, a: tuple(o[0]) + (o[1],))

# full step last (donated: state buffers are recycled each call)
del u, v, w, olds, p0
step = case._step
out = step(state)
jax.block_until_ready(out["u"])
t0 = time.perf_counter()
for _ in range(iters):
    out = step(out)
jax.block_until_ready(out["u"])
ms = (time.perf_counter() - t0) / iters * 1e3
print(f"{'full step (current, donated)':42s} {ms:8.2f} ms")
