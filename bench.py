#!/usr/bin/env python
"""Headline benchmark: TGV DNS wall-clock per step on the local TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context (BASELINE.md): the reference publishes no absolute
numbers; the driver north-star is 512^3 TGV wall-clock/step vs the
reference CUDA backend on A100. vs_baseline here reports throughput
normalised by a 10 ms/step A100-class target at the benchmarked size
(scaled by DOF from 512^3), i.e. >1.0 means faster than target.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n = int(os.environ.get("BENCH_N", "256"))
    n_iters = int(os.environ.get("BENCH_ITERS", "50"))

    # persistent compilation cache: repeat runs skip the (remote) compile
    try:
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/x3d2_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from x3d2_tpu.common import BC
    from x3d2_tpu.mesh import Mesh
    from x3d2_tpu.cases import SolverParams, TGVCase

    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                   verbose=False, keep_pressure=False)
    state = case.initial_state()
    # compile + warmup
    state = case._step(state)
    jax.block_until_ready(state["u"])

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = case._step(state)
    jax.block_until_ready(state["u"])
    ms_per_step = (time.perf_counter() - t0) / n_iters * 1e3

    assert bool(jnp.isfinite(state["u"]).all()), "NaN in benchmark run"

    # A100-class reference target: ~10 ms/step at 512^3 (memory-bound
    # estimate from the reference's 16B-eq/DOF transeq traffic model,
    # BASELINE.md); scale by DOF for other sizes.
    target_ms = 10.0 * (n / 512) ** 3
    result = {
        "metric": f"TGV {n}^3 f32 AB3 wall-clock per step (1 chip)",
        "value": round(ms_per_step, 3),
        "unit": "ms/step",
        "vs_baseline": round(target_ms / ms_per_step, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
