#!/usr/bin/env python
"""AOT-compile the species kernels for a deviceless TPU topology.

Validates Mosaic lowering of the v3 species sweeps (single-device and
halo-ext sharded variants, ops/pallas_kernels.make_species_dir_v3 /
parallel/shard_kernels.make_sharded_species_v3) against the real TPU
compiler without any attached chip — same mechanism as
tools/aot_tpu_check.py. Usage: python tools/aot_species_check.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from jax.experimental import topologies
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_kernels import make_fused_species_v3
from x3d2_tpu.parallel.shard_kernels import make_sharded_species_v3
from x3d2_tpu.parallel.topo import make_device_mesh

topo = topologies.get_topology_desc(topology_name="v5e:2x4", platform="tpu")
devs = list(topo.devices)

NUS = (1 / 1600, 1 / 400)
ok = True

# --- single-device kernels: replicated over a 1-device mesh ---------------
dims = (128, 128, 256)
mesh = Mesh(dims, (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32, nu_species=NUS)
fn1 = make_fused_species_v3(ns.ops, NUS, dims)
m1 = DeviceMesh(np.asarray(devs[:1]), axis_names=("d",))
sh1 = NamedSharding(m1, P())
sds = jax.ShapeDtypeStruct(dims, jnp.float32, sharding=sh1)
print(f"lowering single-device species kernels at {dims} ...", flush=True)
c1 = jax.jit(lambda p, u, v, w: fn1(p, u, v, w)).lower(
    (sds, sds), sds, sds, sds).compile()
n1 = len(re.findall(r'custom_call_target="tpu_custom_call"',
                    c1.as_text()))
print(f"  mosaic kernels: {n1}")
ok &= n1 >= 3   # three direction sweeps

# (the merged momentum+species chain was removed in round 4 — measured
# 0.63x the standalone kernels on-chip in round 3)

# --- sharded halo-ext kernels over the 2x4 topology -----------------------
dims = (128, 256, 512)
mesh = Mesh(dims, (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32, nu_species=NUS)
dmesh = make_device_mesh(2, 4, devs)
fn2 = make_sharded_species_v3(ns, dmesh)
fspec = NamedSharding(dmesh, P(None, "y", "z"))
pspec = NamedSharding(dmesh, P(None, None, "y", "z"))
fs = jax.ShapeDtypeStruct(dims, jnp.float32, sharding=fspec)
ps = jax.ShapeDtypeStruct((2,) + dims, jnp.float32, sharding=pspec)
print(f"lowering sharded species kernels at {dims} on v5e:2x4 ...",
      flush=True)
c2 = jax.jit(lambda p, u, v, w: fn2(tuple(p[i] for i in range(2)),
                                    u, v, w)).lower(ps, fs, fs, fs).compile()
txt = c2.as_text()
n2 = len(re.findall(r'custom_call_target="tpu_custom_call"', txt))
census = {op: len(re.findall(rf"\b{op}(?:-start)?\(", txt))
          for op in ("all-gather", "collective-permute")}
print(f"  mosaic kernels: {n2}; census: {census}")
ok &= n2 >= 3 and census["collective-permute"] > 0
ok &= census["all-gather"] == 0

print(("PASS" if ok else "FAIL")
      + ": species kernels AOT-compiled for a deviceless TPU topology")
sys.exit(0 if ok else 1)
