#!/usr/bin/env python
"""Measured KE-curve parity: f32 TPU trajectories vs an f64 CPU reference.

BASELINE.md north star: the kinetic-energy decay of the TPU f32 production
path must match the f64 trajectory to 1e-6 over a full TGV run (the
reference's own correctness ethos, /root/reference/tests/verification/
tolerances).  Round-2 only *estimated* this from per-step drift; this tool
measures the actual two-trajectory curve difference.

Modes (one process per variant — the matmul precision is bound at import
time via X3D2_MATMUL_PRECISION):

    python tools/ke_parity.py ref [n] [t_end]   # f64 CPU trajectory
    python tools/ke_parity.py tpu [n] [t_end]   # f32 TPU, tagged by env:
        X3D2_MATMUL_PRECISION=high|highest, X3D2_KE_COMPENSATED=1
    python tools/ke_parity.py report [n]        # compare all saved curves

Curves are saved to validation/keparity_{n}_{tag}.npz with KE sampled
every SAMPLE steps, reduced host-side in f64 (an on-device f32 mean has
~1e-7 noise — above the budget being measured).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

mode = sys.argv[1] if len(sys.argv) > 1 else "report"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
t_end = float(sys.argv[3]) if len(sys.argv) > 3 else 14.0
dt = 1e-3
SAMPLE = int(os.environ.get("KE_SAMPLE", "20"))

if mode == "ref":
    os.environ["X3D2_PALLAS"] = "0"

import numpy as np
import jax
import jax.numpy as jnp


def ke_host_f64(state):
    """KE reduced host-side in float64 (measurement-grade accuracy)."""
    tot = 0.0
    for k in ("u", "v", "w"):
        a = np.asarray(state[k]).astype(np.float64)
        tot += float((a * a).sum())
    return 0.5 * tot / (np.prod(np.asarray(state["u"]).shape))


def _flatten_state(state, prefix=""):
    """Flatten a (possibly nested dict/tuple) solver state into arrays."""
    out = {}
    if isinstance(state, dict):
        it = state.items()
    else:  # tuple/list (e.g. AB olds)
        it = ((str(i), v) for i, v in enumerate(state))
    for k, v in it:
        key = f"{prefix}{k}"
        if isinstance(v, (dict, tuple, list)):
            out.update(_flatten_state(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_into(template, flat, prefix=""):
    """Rebuild state with template's structure from the flat npz arrays."""
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/")
                if isinstance(v, (dict, tuple, list))
                else flat[f"{prefix}{k}"].astype(np.asarray(v).dtype)
                for k, v in template.items()}
    rebuilt = [
        _unflatten_into(v, flat, f"{prefix}{i}/")
        if isinstance(v, (dict, tuple, list))
        else flat[f"{prefix}{i}"].astype(np.asarray(v).dtype)
        for i, v in enumerate(template)]
    return tuple(rebuilt) if isinstance(template, tuple) else rebuilt


def run_curve(dtype, compensated, device=None, resume=None):
    from x3d2_tpu.common import BC
    from x3d2_tpu.mesh import Mesh
    from x3d2_tpu.cases import SolverParams, TGVCase

    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=dt,
                          compensated=compensated)
    case = TGVCase(mesh, params, dtype=dtype, monitor_path=None,
                   verbose=False, keep_pressure=False)
    state = case.initial_state()
    start_it = 0
    steps_out, kes = [0], [ke_host_f64(state)]
    if resume and os.path.exists(resume):
        d = np.load(resume)
        start_it = int(d["it"])
        steps_out = list(d["steps"])
        kes = list(d["ke"])
        state = _unflatten_into(state, d, "state/")
        print(f"  resumed from {resume} at step {start_it}", flush=True)
    if device is not None:
        state = jax.device_put(state, device)
        step = jax.jit(case.step_fn, donate_argnums=0, device=device)
    else:
        step = case._step

    nsteps = int(round(t_end / dt))
    t0 = time.perf_counter()
    partial = os.environ.get("KE_PARTIAL")  # incremental curve dump
    for it in range(start_it + 1, nsteps + 1):
        state = step(state)
        if it % SAMPLE == 0:
            steps_out.append(it)
            kes.append(ke_host_f64(state))
            if it % (SAMPLE * 50) == 0:
                el = time.perf_counter() - t0
                done = it - start_it
                print(f"  step {it}/{nsteps} ke={kes[-1]:.10f} "
                      f"[{el:.0f}s, {el / done * 1e3:.0f} ms/step]",
                      flush=True)
                if partial:
                    tmp = partial + ".tmp.npz"
                    np.savez(tmp, steps=np.asarray(steps_out),
                             ke=np.asarray(kes))
                    os.replace(tmp, partial)
                if resume:
                    tmp = resume + ".tmp.npz"
                    np.savez(tmp, it=it, steps=np.asarray(steps_out),
                             ke=np.asarray(kes),
                             **{f"state/{k}": v for k, v in
                                _flatten_state(state).items()})
                    os.replace(tmp, resume)
    return np.asarray(steps_out), np.asarray(kes)


def curve_path(tag):
    return f"validation/keparity_{n}_{tag}.npz"


if mode == "ref":
    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", cpu)
    print(f"f64 CPU reference: TGV {n}^3 Re=1600 AB3 dt={dt} to t={t_end}",
          flush=True)
    with jax.default_device(cpu):
        steps, kes = run_curve(jnp.float64, False,
                               resume=f"validation/keparity_{n}_ref64"
                                      ".resume.npz")
    os.makedirs("validation", exist_ok=True)
    np.savez(curve_path("ref64"), steps=steps, ke=kes)
    print(f"wrote {curve_path('ref64')}")

elif mode == "tpu":
    prec = os.environ.get("X3D2_MATMUL_PRECISION", "high")
    comp = os.environ.get("X3D2_KE_COMPENSATED", "0") == "1"
    tag = f"f32_{prec}" + ("_kahan" if comp else "")
    if os.environ.get("X3D2_BF16_OLDS", "0") == "1":
        tag += "_bf16olds"
    if os.environ.get("X3D2_BF16_ACC", "0") == "1":
        tag += "_bf16acc"
    print(f"f32 TPU [{tag}]: TGV {n}^3 Re=1600 AB3 dt={dt} to t={t_end}",
          flush=True)
    steps, kes = run_curve(jnp.float32, comp)
    os.makedirs("validation", exist_ok=True)
    np.savez(curve_path(tag), steps=steps, ke=kes)
    print(f"wrote {curve_path(tag)}")

else:  # report
    import glob
    ref_file = curve_path("ref64")
    if not os.path.exists(ref_file):
        # fall back to the incremental dump of an in-flight reference leg
        part = curve_path("ref64").replace(".npz", ".partial.npz")
        if not os.path.exists(part):
            sys.exit(f"no reference curve {ref_file}")
        ref_file = part
    ref = np.load(ref_file)
    rs, rke = ref["steps"], ref["ke"]
    print(f"KE-curve parity vs f64 CPU reference, TGV {n}^3 Re=1600 "
          f"(KE_0 = {rke[0]:.6f}, ref covers t=[0,{rs[-1] * dt:.1f}]):")
    print(f"{'variant':>24s} {'max|dKE|':>12s} {'max|dKE|/KE0':>14s} "
          f"{'at t':>6s} {'<=1e-6?':>8s}")
    for f in sorted(glob.glob(f"validation/keparity_{n}_f32*.npz")):
        d = np.load(f)
        m = min(len(rs), len(d["steps"]))
        assert (rs[:m] == d["steps"][:m]).all()
        dke = np.abs(d["ke"][:m] - rke[:m])
        i = int(np.argmax(dke))
        rel = dke[i] / rke[0]
        tag = os.path.basename(f)[len(f"keparity_{n}_"):-4]
        print(f"{tag:>24s} {dke[i]:12.3e} {rel:14.3e} "
              f"{rs[i] * dt:6.2f} {'PASS' if rel <= 1e-6 else 'FAIL':>8s}")
