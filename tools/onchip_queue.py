#!/usr/bin/env python
"""Run the pending on-chip measurement queue (CLAUDE.md) in one shot.

The device relay has been down for much of round 3; this script exists
so that the moment it returns, a single command captures every queued
measurement in priority order, each in its OWN subprocess (the relay
deadlocks with two concurrent TPU clients, and a wedged job must not
take the rest of the queue down with it).

Order (most important first — the relay may die again mid-queue):
  1. bench.py                      — the headline number
  2. tools/prof_species.py         — species kernels execute + time
  3. tools/prof512.py (DIMSEM A/B) — parallel dimension_semantics
  4. tools/prof_dma.py 512         — the ~260 GB/s Pallas pipeline ladder
  5. tools/prof_manual.py          — manual-DMA x-apply A/B

Usage: python tools/onchip_queue.py [--skip N,N,...]
Logs to validation/onchip_queue_<jobname>.log; prints a PASS/FAIL table.
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    ("bench", [sys.executable, "bench.py"], 2400, {}),
    ("prof_pressure", [sys.executable, "tools/prof_pressure.py",
                       "512", "20"], 1800, {}),
    ("prof_rk", [sys.executable, "tools/prof_rk.py", "256", "30"],
     2000, {}),
    ("prof_species", [sys.executable, "tools/prof_species.py"], 1800, {}),
    ("prof512_dimsem0", [sys.executable, "tools/prof512.py", "512", "20"],
     2400, {"X3D2_DIMSEM": "0"}),
    ("shardmap", [sys.executable, "tools/onchip_shardmap.py"], 1800, {}),
]


def probe_relay(timeout=60):
    """True when a jax backend init completes (relay up)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=timeout, cwd=ROOT)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    skip = set()
    if "--skip" in sys.argv:
        skip = {int(x) for x in
                sys.argv[sys.argv.index("--skip") + 1].split(",")}
    if not probe_relay():
        print("RELAY DOWN: backend init did not complete; aborting")
        return 2
    print("relay up; running queue")
    os.makedirs(os.path.join(ROOT, "validation"), exist_ok=True)
    results = []
    for idx, (name, cmd, tmo, env_extra) in enumerate(JOBS, 1):
        if idx in skip:
            results.append((name, "SKIPPED", 0.0))
            continue
        log = os.path.join(ROOT, "validation",
                           f"onchip_queue_{name}.log")
        env = dict(os.environ, **env_extra)
        t0 = time.time()
        try:
            with open(log, "w") as fh:
                r = subprocess.run(cmd, cwd=ROOT, env=env, timeout=tmo,
                                   stdout=fh, stderr=subprocess.STDOUT)
            status = "PASS" if r.returncode == 0 else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            status = "TIMEOUT"
        dt = time.time() - t0
        results.append((name, status, dt))
        print(f"[{idx}/{len(JOBS)}] {name:18s} {status:8s} {dt:7.1f}s "
              f"-> {os.path.relpath(log, ROOT)}", flush=True)
        if status == "TIMEOUT" and not probe_relay():
            print("relay died mid-queue; stopping")
            break
        # a timed-out TPU client may leave the relay wedged briefly
        if status != "PASS":
            time.sleep(10)
    print("\nsummary:")
    for name, status, dt in results:
        print(f"  {name:18s} {status:8s} {dt:7.1f}s")
    return 0 if all(s in ("PASS", "SKIPPED") for _, s, _ in results) else 1


if __name__ == "__main__":
    sys.exit(main())
