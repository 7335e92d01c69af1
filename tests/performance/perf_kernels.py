"""Performance benchmarks (reference tests/performance analogue).

Prints machine-parseable lines in the reference's format
(tests/common/test_utils.f90:58-61):

    PERF_METRIC: <label> time=<X>s bw=<Y> GiB/s

with the same hand-counted byte-traffic models (consumed_bw element
accesses per DOF): transeq=16 (perf_cuda_transeq.f90:16), single operator
apply (tds_solve analogue)=8 (perf_cuda_tridiag), poisson=10, plus
utilisation vs the device HBM peak. Excluded from the default pytest run
(set X3D2_PERF=1 to enable); also runnable directly:

    python tests/performance/perf_kernels.py [N]
"""

import os
import sys
import time

import numpy as np

import pytest

if __name__ == "__main__":
    # direct invocation: make the repo importable without PYTHONPATH
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))

pytestmark = pytest.mark.skipif(
    not os.environ.get("X3D2_PERF"),
    reason="performance benchmarks (set X3D2_PERF=1)")

# v5e HBM peak; override for other chips
DEVICE_BW_GIB = float(os.environ.get("X3D2_DEVICE_BW_GIB", 819.0))


def _bench(fn, state, n_iters=20):
    import jax
    s = fn(state)
    jax.block_until_ready(s[0] if isinstance(s, tuple) else s)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        s = fn(s if isinstance(s, type(state)) else state)
    jax.block_until_ready(s[0] if isinstance(s, tuple) else s)
    return (time.perf_counter() - t0) / n_iters


def perf_metric(label, t, ndof, consumed_bw, nbytes=4):
    bw = consumed_bw * ndof * nbytes / t / 2**30
    util = 100.0 * bw / DEVICE_BW_GIB
    print(f"PERF_METRIC: {label} time={t:.6f}s bw={bw:.2f} GiB/s "
          f"(util {util:.1f}% of {DEVICE_BW_GIB:.0f})")
    return bw


def run_all(n=256):
    import jax
    import jax.numpy as jnp
    from x3d2_tpu.common import BC
    from x3d2_tpu.mesh import Mesh
    from x3d2_tpu.cases import SolverParams, TGVCase

    mesh = Mesh((n,) * 3, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    case = TGVCase(mesh, SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3),
                   dtype=jnp.float32, monitor_path=None, verbose=False)
    ns = case.solver
    state = case.initial_state()
    u, v, w = state["u"], state["v"], state["w"]
    ndof = n**3

    # single operator apply (tds_solve analogue; model: 8 accesses/DOF
    # like perf_cuda_tridiag)
    op = ns.ops[0].der1st
    f1 = jax.jit(lambda q: op(q, 0))
    t = _bench(lambda q: f1(q) * 0.999 + 0.001, u)
    perf_metric(f"der1st_x n={n}", t, ndof, 8)

    # transeq (model: 16 accesses/DOF per direction x3 directions,
    # perf_cuda_transeq.f90:16)
    tr = jax.jit(lambda a: ns.transeq(a, v, w)[0])
    t = _bench(lambda a: tr(a) * 0.999, u)
    perf_metric(f"transeq n={n}", t, ndof, 48)

    # species transport RHS (reference perf analogue of
    # transeq_species: same 16 accesses/DOF/direction counting as
    # momentum but for one scalar => ~18/DOF total incl. conv reads).
    # Reuse the existing solver's operators; kernels when on TPU.
    nu_sp = (1 / 1600 / 0.7,)
    sp_fn = None
    if getattr(ns, "_transeq_v3", None) is not None:
        from x3d2_tpu.ops.pallas_kernels import make_fused_species_v3
        try:
            sp_fn = make_fused_species_v3(ns.ops, nu_sp, (n,) * 3)
        except ValueError:
            pass
    if sp_fn is None:
        sp_fn = lambda phis, a, b, c: (ns.transeq_species(
            phis[0], a, b, c, nu_sp[0]),)
    sp = jax.jit(lambda p: sp_fn((p,), u, v, w)[0])
    t = _bench(lambda p: sp(p) * 0.999, u)
    perf_metric(f"species_rhs n={n}", t, ndof, 18)

    # poisson (model: ~10 accesses/DOF)
    po = jax.jit(lambda a: ns.poisson(ns.divergence_v2p(a, v, w)))
    t = _bench(lambda a: po(a) * 0.999 + u, u)
    perf_metric(f"div+poisson n={n}", t, ndof, 10)

    # full step
    step = case._step
    s = dict(state)
    s = step(s)
    jax.block_until_ready(s["u"])
    t0 = time.perf_counter()
    N_IT = 20
    for _ in range(N_IT):
        s = step(s)
    jax.block_until_ready(s["u"])
    t = (time.perf_counter() - t0) / N_IT
    # whole-step traffic model: ~100 element accesses per DOF
    perf_metric(f"full_step n={n}", t, ndof, 100)
    print(f"PERF_METRIC: full_step_ms n={n} time={t:.6f}s "
          f"ms_per_step={t * 1e3:.2f}")


def test_perf_kernels():
    run_all(int(os.environ.get("BENCH_N", "256")))


if __name__ == "__main__":
    run_all(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
