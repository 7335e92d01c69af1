#!/usr/bin/env python
"""Headline benchmark: TGV DNS wall-clock per step on the local TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Default size is 512^3 — the driver north-star configuration
(BASELINE.md: 512^3 TGV wall-clock/step vs the reference CUDA backend on
A100). The reference publishes no absolute numbers, so the baseline is
DERIVED from its traffic model (the reference's own perf harness counts
per-kernel bytes/DOF, tests/common/test_utils.f90:146-161):

    the audited step moves ~53 full-field passes (README pass audit:
    9-system transeq sweeps + projection + AB3 history), and a
    memory-bound step cannot beat passes x bytes / HBM bandwidth:

      A100-80GB (2039 GB/s), f64 (reference default):
          53 * n^3 * 8 B / 2039 GB/s  = 27.9 ms at 512^3
      A100-80GB, f32 (SINGLE_PREC build):
          53 * n^3 * 4 B / 2039 GB/s  = 14.0 ms at 512^3

    These assume PERFECT streaming with zero overlap loss, so they are
    lower bounds on the reference's per-step time — vs_baseline computed
    against them understates the repo. vs_baseline (headline) uses the
    f64 target (the reference's default precision); vs_baseline_f32 is
    the same-precision comparison. >1.0 means faster than that bound.

Alongside wall-clock, the line reports:
  - tflops_executed: flops the banded-matmul formulation actually issues
    (MXU-utilisation view; window matmuls do redundant work vs a stencil)
  - tflops_alg_min: the algorithmic-minimum model — ~25 flops/point per
    compact-operator apply (9-pt RHS stencil + tridiagonal solve, the
    counting behind the reference's 16 B-eq/DOF traffic model,
    /root/reference/tests/performance/perf_cuda_transeq.f90:16)
  - per-phase times (transeq / pressure) measured as ISOLATED chained
    fori_loop programs (CLAUDE.md timing methodology). These are
    tagged isolated_nonadditive: consecutive kernels in the full step
    overlap DMA drain/fill, so the isolated phase times sum to MORE
    than the chained step (~1.6x on some kernels) — they attribute
    round-over-round deltas within a phase, never across phases.
    BENCH_PHASES=0 skips them.
"""

import json
import os
import subprocess
import sys
import time

# If the axon relay is unreachable, ANY jax backend init hangs forever
# (the axon get_backend hook dials with no timeout — CLAUDE.md). Probe
# in a subprocess first so the bench fails loudly instead of wedging
# the driver. BENCH_NO_PROBE=1 skips (e.g. CPU-only experiments).
if os.environ.get("BENCH_NO_PROBE", "0") != "1":
    try:
        # DEVNULL, not pipes: a relay-dialing child can fork helpers
        # that inherit the pipes, and the post-kill pipe drain then
        # blocks forever
        _r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=180)
        _ok = _r.returncode == 0
    except subprocess.TimeoutExpired:
        _ok = False
    if not _ok:
        print(json.dumps({
            "metric": "tgv_step_ms", "value": None, "unit": "ms/step",
            "vs_baseline": None,
            "error": "device relay unreachable (jax backend init "
                     "timed out/failed); see CLAUDE.md relay gotcha"}))
        sys.exit(1)

import numpy as np

import jax
import jax.numpy as jnp


def executed_flops(n, case):
    """Flops the implementation issues per step (matmul terms only)."""
    ns = case.solver
    if getattr(ns, "_transeq_v3", None) is not None:
        # banded windows: 96 on axes 0/1, 256 on the lane axis
        transeq = 9 * 2 * (96 + 96 + 256) * n**3
    else:
        transeq = 27 * 2 * n * n**3
    napply = 16 if not case.keep_pressure else 19
    pressure = napply * 2 * n * n**3
    return transeq + pressure


def alg_min_flops(n, case):
    """Algorithmic-minimum model: 25 flops/point per compact apply
    (stencil + solve), 9 transeq + 16|19 projection applies, plus the
    skew-symmetric combine (~27/pt) and AB update (~8/pt)."""
    napply = 9 + (16 if not case.keep_pressure else 19)
    return (25 * napply + 27 + 8) * n**3


def chained_ms(f, args, iters, extra=()):
    """Chained fori_loop timing with a forced scalar readback (host
    loops through the axon relay both add eager overhead and can report
    bogus times; see tools/prof512.py). `extra` operands are passed as
    jit ARGUMENTS and appended to each call — closing over device
    arrays would embed them as n^3 program constants, the exact relay
    wedge CLAUDE.md root-caused."""
    def looped(args, extra):
        out = jax.lax.fori_loop(0, iters,
                                lambda i, c: f(*c, *extra), args)
        leaf = next(x for x in jax.tree_util.tree_leaves(out)
                    if getattr(x, "ndim", 0) == 3)
        return jnp.sum(leaf[0])

    g = jax.jit(looped)
    float(g(args, extra))  # compile + warm
    t0 = time.perf_counter()
    float(g(args, extra))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = int(os.environ.get("BENCH_N", "512"))
    n_iters = int(os.environ.get("BENCH_ITERS", "30"))
    phases = os.environ.get("BENCH_PHASES", "1") != "0"

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
    # compile + warmup of the chunked runner (what case.run dispatches
    # between output boundaries: n_iters steps chained in ONE program)
    state = case._chunk(state, n_iters)
    jax.block_until_ready(state["u"])

    t0 = time.perf_counter()
    state = case._chunk(state, n_iters)
    jax.block_until_ready(state["u"])
    ms_per_step = (time.perf_counter() - t0) / n_iters * 1e3

    assert bool(jnp.isfinite(state["u"]).all()), "NaN in benchmark run"

    # A100 memory-bound lower bounds on the reference's per-step time
    # (see module docstring): 53 audited full-field passes x bytes/DOF
    # / 2039 GB/s (A100-80GB) at PERFECT streaming — the reference
    # cannot be faster than these, so vs_baseline >= these ratios.
    PASSES = 53
    A100_BW = 2039e9
    target_f64_ms = PASSES * n**3 * 8 / A100_BW * 1e3   # 27.9 ms @512^3
    target_f32_ms = PASSES * n**3 * 4 / A100_BW * 1e3   # 14.0 ms @512^3
    exec_tf = executed_flops(n, case) / (ms_per_step * 1e-3) * 1e-12
    alg_tf = alg_min_flops(n, case) / (ms_per_step * 1e-3) * 1e-12
    bf16x3_ceiling = 197.0 / 3
    sustained_gbs = PASSES * n**3 * 4 / (ms_per_step * 1e-3) / 1e9
    result = {
        "metric": f"TGV {n}^3 f32 AB3 wall-clock per step (1 chip)",
        "value": round(ms_per_step, 3),
        "unit": "ms/step",
        # headline: vs the f64 (reference-default-precision) bound
        "vs_baseline": round(target_f64_ms / ms_per_step, 3),
        "vs_baseline_f32": round(target_f32_ms / ms_per_step, 3),
        "baseline_model": (f"{PASSES} passes x n^3 x bytes / 2039 GB/s "
                           "A100-80GB perfect streaming (lower bound on "
                           "the reference's step)"),
        "sustained_gbs": round(sustained_gbs, 0),
        "hbm_util_vs_819_spec": round(sustained_gbs / 819, 3),
        "tflops": round(exec_tf, 1),
        "tflops_alg_min": round(alg_tf, 1),
        "mxu_util_vs_bf16x3_peak": round(exec_tf / bf16x3_ceiling, 3),
    }

    if os.environ.get("BENCH_CASES", "1") != "0":
        # per-case rows: the reference's other production configs
        # (examples/{channel,cylinder}/input.x3d) timed end-to-end via
        # the same chunked runner. Channel exercises the RK3 path and
        # the eigen-resolved stretched-y projection; cylinder the IBM +
        # inflow/outflow path.
        from x3d2_tpu.__main__ import make_case
        from x3d2_tpu.config import Config
        root = os.path.dirname(os.path.abspath(__file__))
        for name, ex in (("channel", "examples/channel/input.x3d"),
                         ("cylinder", "examples/cylinder/input.x3d")):
            try:
                cfg = Config.from_file(os.path.join(root, ex))
                c = make_case(cfg, jnp.float32, verbose=False,
                              monitor_path=None)
                c.keep_pressure = False
                it = int(os.environ.get("BENCH_CASE_ITERS", "40"))
                st = c.initial_state()
                st = c._chunk(st, it)
                jax.block_until_ready(st["u"])
                t0 = time.perf_counter()
                st = c._chunk(st, it)
                jax.block_until_ready(st["u"])
                ms = (time.perf_counter() - t0) / it * 1e3
                if not bool(jnp.isfinite(st["u"]).all()):
                    raise FloatingPointError("NaN in case bench")
                grid = "x".join(str(d) for d in cfg.domain.dims_global)
                result[f"ms_{name}"] = round(ms, 2)
                result[f"{name}_config"] = (
                    f"{grid} {cfg.solver.time_intg} "
                    f"dt={cfg.solver.dt}")
            except Exception as e:
                result[f"{name}_error"] = f"{type(e).__name__}: {e}"[:120]

    if phases:
        try:
            ns = case.solver
            u, v, w = state["u"], state["v"], state["w"]
            it = max(10, n_iters // 2)
            fa = getattr(case, "_fused_ab", None)
            if getattr(case, "_fused_ab_sp", False):
                # species-variant chain has a different signature/return;
                # the bench is momentum-only, so fall back to ns.transeq
                fa = None
            divs = None
            tr_extra = ()
            if fa is not None:
                # time the PRODUCTION chain: fused transeq+AB sweep (the
                # xdiv variant also emits the projection's x-div inputs),
                # so ms_glue isn't polluted by the AB update's cost.
                # olds/dtc/divs ride as chained_ms `extra` JIT ARGUMENTS
                # (closures would embed them as n^3 program constants —
                # the relay wedge gotcha)
                olds = tuple(state["olds"][:3])
                row = [case.dt, 0.0, 0.0, 0.0]
                if case._olds_dtype is not None:
                    # reduced-history kernels take a 5th column (the
                    # error-feedback coefficient dt*future_coeff_sum)
                    row.append(case.dt * case.ti.future_coeff_sum())
                dtc = jnp.asarray(row, case.dtype)

                def tr(a, b, c, olds_, dtc_):
                    return fa(a, b, c, olds_, dtc_)[0]

                tr_extra = (olds, dtc)
                probe = jax.jit(lambda a, b, c, o, d: fa(a, b, c, o, d))(
                    u, v, w, olds, dtc)
                if len(probe) == 3:  # xdiv chain: divs come from transeq
                    divs = jax.block_until_ready(probe[2])
                result["transeq_phase"] = ("fused_ab_xdiv" if divs
                                           is not None else "fused_ab")
            else:
                tr = ns.transeq
                result["transeq_phase"] = "transeq"
            ms_tr = chained_ms(tr, (u, v, w), it, extra=tr_extra)
            # at xdiv sizes the x-div stages live in the transeq phase;
            # time the pressure phase the way the step runs it. The divs
            # must DEPEND on the loop carry (a one-element update keyed
            # on the carry) or XLA hoists the whole mid kernel out of
            # the timing loop as loop-invariant.
            if divs is None:
                pr = lambda a, b, c: ns.pressure_correction(
                    a, b, c, keep_pressure=False)[:3]
                pr_extra = ()
            else:
                def pr(a, b, c, *dv):
                    s = a[0, 0, 0] * 1e-30
                    dv_i = tuple(d.at[0, 0, 0].add(s) for d in dv)
                    return ns.pressure_correction(
                        a, b, c, keep_pressure=False, divs=dv_i)[:3]
                pr_extra = tuple(divs)
            ms_pr = chained_ms(pr, (u, v, w), it, extra=pr_extra)
            result["ms_transeq"] = round(ms_tr, 2)
            result["ms_pressure"] = round(ms_pr, 2)
            # isolated phase chains lose the DMA drain/fill overlap the
            # full step gets between consecutive kernels, so the phases
            # sum to MORE than the step — do not difference them
            result["phase_timing"] = "isolated_nonadditive"
        except Exception as e:  # phases are informational only
            result["phases_error"] = f"{type(e).__name__}: {e}"[:120]

    if os.environ.get("BENCH_SPEEDMODE", "1") != "0":
        # bf16-history SPEED mode (X3D2_BF16_OLDS=1, round 5): ~1e-4
        # pointwise accuracy class over 14k steps (README), so it is
        # NOT the headline — reported as its own row. Same process (a
        # second relay client would deadlock — CLAUDE.md); the default
        # case's buffers are dropped first so both 512^3 states never
        # coexist in HBM.
        try:
            import gc
            del state, case
            # drop every reference to the default case's device buffers
            # (assignment, not del: some only exist when phases ran)
            u = v = w = divs = probe = olds = None
            tr_extra = pr_extra = dtc = st = None
            gc.collect()
            os.environ["X3D2_BF16_OLDS"] = "1"
            scase = TGVCase(mesh, params, dtype=jnp.float32,
                            monitor_path=None, verbose=False,
                            keep_pressure=False)
            sstate = scase.initial_state()
            sstate = scase._chunk(sstate, n_iters)
            jax.block_until_ready(sstate["u"])
            t0 = time.perf_counter()
            sstate = scase._chunk(sstate, n_iters)
            jax.block_until_ready(sstate["u"])
            ms_sp = (time.perf_counter() - t0) / n_iters * 1e3
            assert bool(jnp.isfinite(sstate["u"]).all())
            result["ms_bf16_olds"] = round(ms_sp, 3)
            result["speed_mode"] = ("X3D2_BF16_OLDS=1: bf16 AB history "
                                    "+ error feedback (~1e-4 pointwise "
                                    "class; README accuracy table)")
        except Exception as e:
            result["speedmode_error"] = f"{type(e).__name__}: {e}"[:120]
        finally:
            os.environ.pop("X3D2_BF16_OLDS", None)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
