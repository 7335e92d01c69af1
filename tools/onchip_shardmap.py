#!/usr/bin/env python
"""Execute the sharded-kernel machinery COMPILED (not interpret) on the
real single TPU chip (VERDICT r3 #5a) — the closest this environment
gets to multi-device execution:

  1. shard_map production step on a 1x1 device mesh at a kernel-active
     size, vs the unsharded step (exercises shard_map + Mosaic-compiled
     v3/slab kernels together, for real).
  2. The halo-ext v3 sweep kernel (n_shards=2) run per-shard with
     host-built halo extensions, vs the single-shard sweep on the
     global field (executes the Mosaic-compiled halo-ext kernel and its
     shard-offset matrix indexing, which interpret mode and AOT compile
     checks could not).

Usage:  python tools/onchip_shardmap.py [nx ny nz]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

dims = (tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3
        else (128, 256, 256))

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.parallel.topo import make_device_mesh, make_sharded_step

# ---- 1: shard_map step on a 1x1 mesh ----------------------------------
mesh = Mesh(dims, (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
ca = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
             verbose=False, keep_pressure=False)
sa = ca.step_fn(ca.initial_state())
cb = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
             verbose=False, keep_pressure=False)
dmesh = make_device_mesh(1, 1)
step, sb = make_sharded_step(cb, dmesh)
sb = step(sb)
jax.block_until_ready(sb["u"])
uscale = float(jnp.max(jnp.abs(sa["u"])))
err = max(float(jnp.max(jnp.abs(sa[k] - sb[k]))) for k in ("u", "v", "w"))
print(f"1x1 shard_map step vs unsharded: max err {err:.3e} "
      f"(scale {uscale:.3e})", flush=True)
assert err < 3e-4 * uscale

# ---- 2: halo-ext v3 sweep kernel, compiled, per-shard ------------------
from x3d2_tpu.ops.pallas_kernels import make_transeq_dir_v3
from x3d2_tpu.parallel.shard_kernels import _halo_w
from x3d2_tpu.solver import NavierStokes

ns = NavierStokes.build(mesh, nu=1 / 1600, dtype=jnp.float32)
rng = np.random.default_rng(11)
u, v, w = (jnp.asarray(rng.standard_normal(dims) * 0.1, jnp.float32)
           for _ in range(3))

for axis in (1, 2):
    nsh = 2
    wa = _halo_w(axis, 2)
    n_loc = dims[axis] // nsh
    local = list(dims)
    local[axis] = n_loc
    kern = make_transeq_dir_v3(ns.ops[axis], ns.nu, axis, tuple(local),
                               terms=2, n_shards=nsh)
    ref_kern = make_transeq_dir_v3(ns.ops[axis], ns.nu, axis, dims,
                                   terms=2)
    ref = jax.jit(lambda a, b, c: ref_kern(a, b, c))(u, v, w)
    bs = 128 if axis == 2 else 64
    nb_loc = n_loc // bs

    def shard_slice(q, s):
        sl = [slice(None)] * 3
        sl[axis] = slice(s * n_loc, (s + 1) * n_loc)
        return q[tuple(sl)]

    def ext_slice(q, s):
        idx = (np.arange(s * n_loc - wa, (s + 1) * n_loc + wa)
               % dims[axis])
        return jnp.take(q, jnp.asarray(idx), axis=axis)

    outs = []
    run = jax.jit(lambda a, b, c, exts, off:
                  kern(a, b, c, exts=exts, off=off))
    for s in range(nsh):
        locs = tuple(shard_slice(q, s) for q in (u, v, w))
        exts = tuple(ext_slice(q, s) for q in (u, v, w))
        off = jnp.asarray(s * nb_loc, jnp.int32)
        outs.append(run(*locs, exts, off))
    got = tuple(jnp.concatenate([outs[0][c], outs[1][c]], axis=axis)
                for c in range(3))
    scale = max(float(jnp.max(jnp.abs(r))) for r in ref)
    err = max(float(jnp.max(jnp.abs(g - r))) for g, r in zip(got, ref))
    print(f"halo-ext v3 sweep axis={axis} (2 shards, compiled) vs "
          f"single-shard: max err {err:.3e} (scale {scale:.3e})",
          flush=True)
    assert err < 1e-5 * scale
print("ONCHIP SHARDMAP OK")
