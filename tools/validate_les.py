#!/usr/bin/env python
"""Quantitative LES (SVV) validation: coarse 64^3 TGV Re=1600 with the
hyperviscous compact6 closure (der2nd_scheme='compact6-hyperviscous',
reference tdsops.f90:443-458 c_nu/nu0_nu spectral-viscosity algebra)
against the repo's OWN 512^3 DNS dissipation curve
(validation/tgv512_re1600.csv, tools/validate_tgv.py).

The compared quantity is the TOTAL kinetic-energy dissipation rate
-dKE/dt computed identically for both runs (central differences of the
sampled KE), so the SVV contribution is included on the LES side. Pass
criterion (stated, not tuned): the LES peak -dKE/dt within TOL of the
DNS peak, and closer to it than the un-closured 64^3 run's peak (the
value SVV adds at marginal resolution).

Writes validation/les64_re1600.csv and prints a PASS/FAIL line.

Usage:  python tools/validate_les.py [n] [t_end] [tol]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 14.0
TOL = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase

Re, dt, sample = 1600.0, 1e-3, 50
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def run(scheme):
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=Re, time_intg="AB3", dt=dt,
                          der2nd_scheme=scheme, c_nu=0.44, nu0_nu=4.0)
    case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                   verbose=False, keep_pressure=False)
    state = case.initial_state()
    nsteps = int(round(t_end / dt))
    ts, kes = [], []
    t0 = time.perf_counter()
    for it in range(0, nsteps + 1, sample):
        u, v, w = state["u"], state["v"], state["w"]
        ke = float(0.5 * jnp.mean(u * u + v * v + w * w))
        ts.append(it * dt)
        kes.append(ke)
        if it < nsteps:
            state = case._chunk(state, min(sample, nsteps - it))
    print(f"  {scheme}: {nsteps} steps in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    return np.asarray(ts), np.asarray(kes)


def peak_eps(ts, kes):
    eps = -np.gradient(kes, ts)
    i = int(np.argmax(eps))
    return float(eps[i]), float(ts[i]), eps


print(f"LES validation: {n}^3 TGV Re={Re} SVV vs 512^3 DNS", flush=True)
ts_les, ke_les = run("compact6-hyperviscous")
ts_dns64, ke_dns64 = run("compact6")

ref_csv = os.path.join(ROOT, "validation", "tgv512_re1600.csv")
ref = np.genfromtxt(ref_csv, delimiter=",", names=True)
p_ref, t_ref, _ = peak_eps(ref["t"], ref["ke"])
p_les, t_les, eps_les = peak_eps(ts_les, ke_les)
p_64, t_64, eps_64 = peak_eps(ts_dns64, ke_dns64)

out = os.path.join(ROOT, "validation", f"les{n}_re1600.csv")
with open(out, "w") as fh:
    fh.write("t,ke_svv,ke_plain,eps_svv,eps_plain\n")
    eps_p = -np.gradient(ke_dns64, ts_dns64)
    for row in zip(ts_les, ke_les, ke_dns64, eps_les, eps_p):
        fh.write(",".join(f"{x:.8f}" for x in row) + "\n")
print(f"wrote {out}")

rel_les = abs(p_les - p_ref) / p_ref
rel_64 = abs(p_64 - p_ref) / p_ref
print(f"DNS 512^3 peak -dKE/dt = {p_ref:.5f} at t={t_ref:.2f}")
print(f"LES  SVV {n}^3 peak    = {p_les:.5f} at t={t_les:.2f} "
      f"(rel err {rel_les * 100:.1f}%)")
print(f"plain   {n}^3 peak     = {p_64:.5f} at t={t_64:.2f} "
      f"(rel err {rel_64 * 100:.1f}%)")
ok = rel_les < TOL and rel_les <= rel_64
print(("PASS" if ok else "FAIL")
      + f": SVV peak within {TOL * 100:.0f}% of DNS"
      + (" and not worse than un-closured" if ok else ""))
sys.exit(0 if ok else 1)
