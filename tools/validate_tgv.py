#!/usr/bin/env python
"""TGV Re=1600 validation: kinetic-energy dissipation curve vs the
published spectral-DNS benchmark (Brachet et al.; van Rees et al. 2011:
eps_max ~= 0.0117-0.0122 at t ~= 9.0).

Runs the full TPU f32 production path (v3 Pallas kernels, matmul
Poisson), sampling KE and enstrophy every `sample` steps; writes
validation/tgv{N}_re1600.csv with columns t, ke, enstrophy,
eps_enstrophy (= 2 nu E, the viscous dissipation) and prints the
dissipation peak. Usage:

    python tools/validate_tgv.py [N] [t_end] [sample] [--tag SUFFIX]

--tag suffixes the output CSV (e.g. `--tag _bf16olds` with
X3D2_BF16_OLDS=1 validates the speed mode's physics without
overwriting the production artifact).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

argv = list(sys.argv[1:])
tag = ""
if "--tag" in argv:
    i = argv.index("--tag")
    tag = argv[i + 1]
    del argv[i:i + 2]
n = int(argv[0]) if len(argv) > 0 else 256
t_end = float(argv[1]) if len(argv) > 1 else 14.0
sample = int(argv[2]) if len(argv) > 2 else 25

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.io.monitoring import make_observables_fn

Re, dt = 1600.0, 1e-3
mesh = Mesh((n, n, n), (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
params = SolverParams(Re=Re, time_intg="AB3", dt=dt)
case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
               verbose=False, keep_pressure=False)
obs_fn = make_observables_fn(case.solver)

state = case.initial_state()
rows = []
nsteps = int(round(t_end / dt))
t0 = time.perf_counter()
it = 0
while True:
    if it % sample == 0:
        o = obs_fn(state["u"], state["v"], state["w"])
        rows.append((it * dt, float(o["ke"]), float(o["enstrophy"])))
        if it % (sample * 40) == 0:
            el = time.perf_counter() - t0
            print(f"t={it * dt:6.2f} ke={rows[-1][1]:.6f} "
                  f"E={rows[-1][2]:.4f} [{el:6.1f}s]", flush=True)
    if it >= nsteps:
        break
    # chunked dispatch to the next sample boundary (k static): one
    # relay round-trip per sample instead of per step
    k = min(sample - it % sample if it % sample else sample,
            nsteps - it)
    state = case._chunk(state, k) if k > 1 else case._step(state)
    it += k

rows = np.asarray(rows)
t, ke, ens = rows[:, 0], rows[:, 1], rows[:, 2]
eps = 2.0 / Re * ens
os.makedirs("validation", exist_ok=True)
out = f"validation/tgv{n}_re1600{tag}.csv"
with open(out, "w") as fh:
    fh.write("t,ke,enstrophy,eps_enstrophy\n")
    for r, e in zip(rows, eps):
        fh.write(f"{r[0]:.4f},{r[1]:.8f},{r[2]:.8f},{e:.8f}\n")

ipk = int(np.argmax(eps))
print(f"\nwrote {out}")
print(f"dissipation peak: eps_max = {eps[ipk]:.5f} at t = {t[ipk]:.2f}")
print("published spectral DNS: eps_max ~= 0.0117-0.0122 at t ~= 9.0")
wall = time.perf_counter() - t0
print(f"wall: {wall:.0f}s for {nsteps} steps "
      f"({wall / nsteps * 1e3:.2f} ms/step incl. sampling)")
