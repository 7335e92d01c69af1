#!/usr/bin/env python
"""Run the pending on-chip measurement queue (CLAUDE.md) in one shot.

The device relay has repeatedly wedged mid-round (round 3: down for
hours; round 5: silent pre-compile wedges when a client dials during
another's asynchronous server-side teardown). This script exists so
that a single command captures every queued measurement in priority
order, each in its OWN subprocess (the relay deadlocks with two
concurrent TPU clients, and a wedged job must not take the rest of the
queue down with it), with the hard-won client hygiene applied:

  - >=90 s between one client exiting (incl. killed/timed-out jobs and
    probe subprocesses) and the next dialing — server-side session
    teardown is asynchronous and a client that dials during it wedges
    SILENTLY (no step output, ~0 CPU growth, forever).
  - a stall detector: if a job's log stops growing for --stall seconds
    (default 420 — healthy jobs here print within ~3-4 min even
    through a 512^3 remote compile), the job is killed as wedged
    instead of burning its full timeout.
  - probes are real clients too: --wait polls sparingly (every 6 min,
    120 s budget) rather than hammering the relay with doomed dials.

Order (most important first — the relay may die again mid-queue):
  1. channel_fine — 192x129x96 grid-refinement channel run (VERDICT r4
     weak #5: show the Re_tau gap is resolution, not numerics)
  2. bench        — the headline number + the bf16-olds speed-mode row
  3. d2c_bf16     — X3D2_D2C=1 stacked on the bf16 history (the d2-in-C
     carry was a wash at the 62.8 f32-history state; the bf16 chain is
     faster so the 3 saved reads are a larger fraction)

Usage: python tools/onchip_queue.py [--skip N,N,...] [--wait] [--stall S]
Logs to validation/onchip_queue_<jobname>.log; prints a PASS/FAIL table.
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, cmd, timeout_s, env, stall_s) — stall_s None disables the
# stall detector (bench.py prints its ONE JSON line only at the end,
# so log growth says nothing about its health).
JOBS = [
    # known-good programs first (the 192^3-grid channel program wedged
    # 3/3 times on 2026-08-20 while probes intermittently passed):
    # headline + bf16-olds speed row
    ("bench", [sys.executable, "bench.py"], 2400, {}, None),
    # NEW round-5 lever: bf16 partial streams stacked on bf16 history
    ("acc_bf16", [sys.executable, "bench.py"], 1800,
     {"X3D2_BF16_OLDS": "1", "X3D2_BF16_ACC": "1", "BENCH_CASES": "0",
      "BENCH_PHASES": "0", "BENCH_SPEEDMODE": "0"}, None),
    # d2-in-C carry stacked on bf16 history (was a wash at f32 history)
    ("d2c_bf16", [sys.executable, "bench.py"], 1800,
     {"X3D2_D2C": "1", "X3D2_BF16_OLDS": "1", "BENCH_CASES": "0",
      "BENCH_PHASES": "0", "BENCH_SPEEDMODE": "0"}, None),
    # channel grid refinement: wall-normal-refined first (the wall
    # drives Re_tau and this grid is closest to the known-compiling
    # r4 config), then the full refinement
    ("channel_y", [sys.executable, "tools/validate_channel.py",
                   "80000", "10", "--grid", "128", "129", "64",
                   "--dt", "2.5e-3", "--tag", "_128x129x64"],
     3600, {}, 420),
    ("channel_fine", [sys.executable, "tools/validate_channel.py",
                      "80000", "10", "--grid", "192", "129", "96",
                      "--dt", "2.5e-3", "--tag", "_192x129x96"],
     3600, {}, 420),
    # round-5 channel verdict experiment: the refinement runs show
    # Re_tau ~201-203 CONVERGED in the reference's 4x2x2 box, so the
    # gap vs KMM's 178 is the (near-minimal) box, not numerics. Run
    # the KMM-sized box (4pi x 2 x 4pi/3) at KMM-grade x/z resolution
    # (dx+ ~12, dz+ ~8) with the reference's 65-pt stretched y (the
    # y-refinement run proved 65 -> 129 moves Re_tau only +0.6%).
    # NOTE grid choice is einsum-path-cost-bound: the Dirichlet+
    # stretched channel runs dense resolved applies (O(n) flops/DOF
    # per axis), and the 192x129x96 refinement run measured
    # ~115 ms/step — 129-pt y plus KMM box does not fit a queue slot.
    ("channel_kmmbox", [sys.executable, "tools/validate_channel.py",
                        "80000", "10", "--grid", "192", "65", "96",
                        "--dt", "5e-3", "--box", "12.566370614",
                        "4.188790205", "--tag", "_kmmbox_192x65x96"],
     3600, {"X3D2_CHANNEL_BUDGET_S": "2700"}, 420),
    # speed-mode physics artifact: the full 512^3 TGV t=0..14 arc in
    # the bf16-olds mode (wall-clock row + dissipation peak for the
    # README accuracy table)
    ("tgv512_bf16olds", [sys.executable, "tools/validate_tgv.py",
                         "512", "14.0", "25", "--tag", "_bf16olds"],
     2400, {"X3D2_BF16_OLDS": "1"}, 420),
]

TEARDOWN_S = 90  # min gap between any client exit and the next dial


def probe_relay(timeout=120):
    """True when a trivial on-chip op completes (relay healthy, not
    just reachable). DEVNULL, not pipes: the relay client forks
    helpers that inherit pipes and the post-kill drain blocks."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.ones((128,128)))))"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=timeout, cwd=ROOT)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_job(cmd, log, env, tmo, stall_s):
    """Run one client; kill it early if its log freezes (silent wedge).
    Returns (status, wall_s)."""
    t0 = time.time()
    with open(log, "w") as fh:
        p = subprocess.Popen(cmd, cwd=ROOT, env=env, stdout=fh,
                             stderr=subprocess.STDOUT)
        last_size, last_change = -1, time.time()
        while True:
            rc = p.poll()
            if rc is not None:
                return ("PASS" if rc == 0 else f"rc={rc}",
                        time.time() - t0)
            now = time.time()
            if now - t0 > tmo:
                p.kill()
                p.wait()
                return "TIMEOUT", now - t0
            try:
                size = os.path.getsize(log)
            except OSError:
                size = -1
            if size != last_size:
                last_size, last_change = size, now
            elif stall_s is not None and now - last_change > stall_s:
                p.kill()
                p.wait()
                return "WEDGED", now - t0
            time.sleep(5)


def main():
    skip = set()
    if "--skip" in sys.argv:
        skip = {int(x) for x in
                sys.argv[sys.argv.index("--skip") + 1].split(",")}
    stall_s = (int(sys.argv[sys.argv.index("--stall") + 1])
               if "--stall" in sys.argv else 420)
    wait = "--wait" in sys.argv

    def await_relay():
        while not probe_relay():
            if not wait:
                return False
            print(f"[{time.strftime('%H:%M:%S')}] relay not healthy; "
                  "retrying in 6 min", flush=True)
            time.sleep(360)
        time.sleep(TEARDOWN_S)  # the probe itself was a client
        return True

    if not await_relay():
        print("RELAY DOWN/WEDGED: trivial on-chip op did not "
              "complete; aborting (use --wait to poll)")
        return 2
    print("relay up; running queue", flush=True)
    os.makedirs(os.path.join(ROOT, "validation"), exist_ok=True)
    results = []
    for idx, (name, cmd, tmo, env_extra, job_stall) in enumerate(JOBS, 1):
        if idx in skip:
            results.append((name, "SKIPPED", 0.0))
            continue
        log = os.path.join(ROOT, "validation",
                           f"onchip_queue_{name}.log")
        env = dict(os.environ, **env_extra)
        status = dt = None
        for attempt in (1, 2):  # one retry per job, behind a health gate
            status, dt = run_job(cmd, log, env, tmo,
                                 job_stall if job_stall is None
                                 else stall_s)
            print(f"[{idx}/{len(JOBS)}] {name:18s} {status:8s} "
                  f"{dt:7.1f}s (attempt {attempt}) "
                  f"-> {os.path.relpath(log, ROOT)}", flush=True)
            time.sleep(TEARDOWN_S)  # teardown gap after EVERY client
            if status == "PASS" or attempt == 2:
                break
            if not await_relay():
                break
        results.append((name, status, dt))
    print("\nsummary:")
    for name, status, dt in results:
        print(f"  {name:18s} {status:8s} {dt:7.1f}s")
    return 0 if all(s in ("PASS", "SKIPPED") for _, s, _ in results) else 1


if __name__ == "__main__":
    sys.exit(main())
