#!/usr/bin/env python
"""AOT Mosaic-compile the manual-DMA x-apply kernels for a v5e.

Relay-down verifiable (local libtpu via jax.experimental.topologies,
like tools/aot_tpu_check.py): catches HBM-slice alignment / semaphore
lowering errors in ops/pallas_manual.py before any on-chip run.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python tools/aot_manual_check.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x3d2_tpu.ops.matmul_poisson import real_dft_matrix
from x3d2_tpu.ops.pallas_manual import make_x_apply_manual

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512

topo = topologies.get_topology_desc(topology_name="v5e:2x4", platform="tpu")
mesh1 = Mesh(np.array(topo.devices[:1]), ("d",))
sh = NamedSharding(mesh1, P())
x = jax.ShapeDtypeStruct((n, n, n), jnp.float32, sharding=sh)

rng = np.random.default_rng(0)
sten = rng.standard_normal(5)
Op = np.zeros((n, n))
for k, c in zip(range(-2, 3), sten):
    Op += c * np.roll(np.eye(n), k, axis=1)
T = real_dft_matrix(n)
Mf, Mi = T @ Op, Op @ np.linalg.inv(T)

ok = True
for label, M, kw, nargs in [
        ("dense", Mf, {}, 1),
        ("dense+sub", Mf, dict(sub=True), 2),
        ("parity fwd", Mf, dict(parity="fwd"), 1),
        ("parity inv", Mi, dict(parity="inv"), 1),
        ("parity inv+sub", Mi, dict(parity="inv", sub=True), 2),
        ("dense slots=6", Mf, dict(slots=6), 1)]:
    try:
        fn = make_x_apply_manual(M, terms=2, **kw)
        jax.jit(fn, out_shardings=sh).lower(*([x] * nargs)).compile()
        print(f"{label:18s} AOT OK", flush=True)
    except Exception as e:
        ok = False
        print(f"{label:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")

print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
