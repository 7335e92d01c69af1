#!/usr/bin/env python
"""AOT-compile the SINGLE-chip production step for a deviceless TPU.

tools/aot_tpu_check.py covers the sharded program; this covers the
single-chip kernel stack (fused-AB transeq chain + pipe3 projection)
— the program bench.py times — so new kernel variants' Mosaic
lowering is verifiable with the relay down (local libtpu via
jax.experimental.topologies). The kernel-construction gate reads
jax.default_backend(), which is "cpu" in a relay-free process, so it
is monkeypatched to "tpu" BEFORE the case is built; arrays still
place on the CPU backend (the only one attached) and only
ShapeDtypeStructs reach the compiler.

Usage (env knobs like X3D2_BF16_OLDS/X3D2_BF16_ACC apply):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/aot_singlechip_check.py [n]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.default_backend = lambda: "tpu"  # gate: build the TPU kernel stack

import numpy as np
import jax.numpy as jnp
from jax.experimental import topologies

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
topo = topologies.get_topology_desc(topology_name="v5e:2x2",
                                    platform="tpu")
dev = list(topo.devices)[0]
params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
case = TGVCase(Mesh((n,) * 3, (2 * np.pi,) * 3,
                    ((BC.PERIODIC, BC.PERIODIC),) * 3),
               params, dtype=jnp.float32, monitor_path=None,
               verbose=False, keep_pressure=False)
flags = {k: v for k, v in os.environ.items() if k.startswith("X3D2_")}
print(f"single-chip kernel stack at {n}^3: fused_ab="
      f"{case._fused_ab is not None} olds={case._olds_dtype} "
      f"acc={case._acc_dtype} flags={flags}", flush=True)
# big grids: never materialise n^3 ICs — remap a 64^3 proxy state's
# trailing dims (same pytree structure; >=3-dim leaves carry the grid)
proxy = TGVCase(Mesh((64,) * 3, (2 * np.pi,) * 3,
                     ((BC.PERIODIC, BC.PERIODIC),) * 3),
                params, dtype=jnp.float32, monitor_path=None,
                verbose=False, keep_pressure=False)
s = jax.sharding.SingleDeviceSharding(dev)
sds = jax.tree_util.tree_map(
    lambda x: jax.ShapeDtypeStruct(
        x.shape[:-3] + (n,) * 3 if getattr(x, "ndim", 0) >= 3
        else x.shape, x.dtype, sharding=s),
    proxy.initial_state())
print("lowering the full step ...", flush=True)
t0 = time.time()
compiled = jax.jit(case.step_fn).lower(sds).compile()
txt = compiled.as_text()
nmos = len(re.findall(r'custom_call_target="tpu_custom_call"', txt))
ok = case._fused_ab is not None and nmos > 0
print(("PASS" if ok else "FAIL")
      + f": compiled in {time.time() - t0:.1f}s; mosaic kernels: {nmos}")
sys.exit(0 if ok else 1)
