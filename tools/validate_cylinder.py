#!/usr/bin/env python
"""Cylinder-wake physics validation: Strouhal number at Re=300.

Runs the reference cylinder configuration
(/root/reference/examples/cylinder/input.x3d: 257x128x32, L=(20,10,2.5),
Re=300, AB3, dt=7.5e-3, IBM mask D=1 cylinder at (10,5), inflow
Dirichlet + convective outflow, case/cylinder.f90:109-243) on the TPU
f32 production path, records the cross-stream velocity at a wake probe
2.5D downstream, and measures the vortex-shedding Strouhal number from
the spectrum of the stationary tail. Published: St ~= 0.203 at Re=300
(Williamson 1996 3-D wake; 2-D simulations give ~0.21).

Writes validation/cylinder_re300.csv and prints the summary.
Usage: python tools/validate_cylinder.py [n_iters] [sample]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
sample = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from x3d2_tpu.common import BC, DataLoc
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import CylinderCase, SolverParams
from x3d2_tpu.config import CylinderConfig

mesh = Mesh((257, 128, 32), (20.0, 10.0, 2.5),
            ((BC.DIRICHLET, BC.DIRICHLET),
             (BC.PERIODIC, BC.PERIODIC),
             (BC.PERIODIC, BC.PERIODIC)))
params = SolverParams(Re=300.0, time_intg="AB3", dt=7.5e-3, ibm_on=True)
case = CylinderCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                    verbose=False,
                    case_cfg=CylinderConfig(
                        init_noise=(0.0125, 0.0125, 0.0),
                        inlet_noise=(0.0125, 0.0, 0.0)))
dt = params.dt

# wake probe 2.5 diameters downstream of the cylinder centre (10, 5)
X, Y, Z = [np.asarray(c) for c in mesh.coord_grids(DataLoc.VERT)]
xs = X.reshape(-1)
ys = Y.reshape(-1)
ix = int(np.argmin(np.abs(xs - 12.5)))
iy = int(np.argmin(np.abs(ys - 5.0)))
iz = mesh.dims(DataLoc.VERT)[2] // 2


@jax.jit
def probe(state):
    return (state["v"][ix, iy, iz],
            state["u"][ix, iy, iz],
            jnp.max(jnp.abs(state["v"])))


state = case.initial_state()
rows = []
t0 = time.perf_counter()
for it in range(1, n_iters + 1):
    state = case._step(state)
    if it % sample == 0:
        vp, up, vmax = (float(x) for x in probe(state))
        rows.append((it * dt, vp, up, vmax))
        if it % (sample * 500) == 0:
            el = time.perf_counter() - t0
            print(f"it={it}/{n_iters} t={it * dt:.1f} v_probe={vp:+.4f} "
                  f"|v|max={vmax:.3f} [{el:.0f}s, "
                  f"{el / it * 1e3:.1f} ms/step]", flush=True)

rows = np.asarray(rows)
os.makedirs("validation", exist_ok=True)
out = "validation/cylinder_re300.csv"
with open(out, "w") as fh:
    fh.write("t,v_probe,u_probe,vmax\n")
    for r in rows:
        fh.write(f"{r[0]:.4f},{r[1]:.6f},{r[2]:.6f},{r[3]:.6f}\n")

# Strouhal from the last 60% (transient discarded): D = 1, U_inf = 1
tail = rows[int(len(rows) * 0.4):]
sig = tail[:, 1] - tail[:, 1].mean()
dts = sample * dt
freqs = np.fft.rfftfreq(len(sig), dts)
spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig))))
ipk = int(np.argmax(spec[1:])) + 1
St = freqs[ipk]
print(f"\nwrote {out}")
print(f"Strouhal = {St:.4f} (published ~0.203 at Re=300; 2-D ~0.21)")
print(f"probe-v amplitude (tail rms) = {sig.std():.4f}")
print(f"wall: {time.perf_counter() - t0:.0f}s for {n_iters} steps")
