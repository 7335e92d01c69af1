"""Sharded v3 Pallas transeq (shard_map + ppermute halos) vs the global
einsum transeq, on the virtual CPU device mesh in interpret mode.

The sharded kernels use the GLOBAL banded operator blocks indexed by
shard offset, so up to bf16x3 matmul noise the result must match the
unsharded dense apply for periodic BCs on every mesh layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.parallel.topo import make_device_mesh
from x3d2_tpu.parallel.shard_kernels import (make_sharded_transeq_v3,
                                             sharded_transeq_v3_supported)


def _solver(dims):
    mesh = Mesh(dims, (2 * np.pi,) * 3, ((BC.PERIODIC, BC.PERIODIC),) * 3)
    return NavierStokes.build(mesh, nu=1 / 1600, dtype=jnp.float32)


@pytest.mark.parametrize("dims,mesh_shape", [
    ((128, 256, 256), (2, 2)),   # both axes sharded
    ((128, 128, 512), (1, 4)),   # lane axis over 4 shards
])
def test_sharded_v3_matches_global(dims, mesh_shape):
    ns = _solver(dims)
    dmesh = make_device_mesh(*mesh_shape)
    assert sharded_transeq_v3_supported(ns, dmesh)
    fn = make_sharded_transeq_v3(ns, dmesh, terms=2, interpret=True)

    rng = np.random.default_rng(7)
    u, v, w = (jnp.asarray(rng.standard_normal(dims), jnp.float32)
               for _ in range(3))
    got = jax.jit(fn)(u, v, w)
    want = ns.transeq(u, v, w)
    for g, e in zip(got, want):
        scale = float(jnp.max(jnp.abs(e)))
        err = float(jnp.max(jnp.abs(g - e)))
        assert err < 5e-5 * scale, f"err {err:.2e} scale {scale:.2e}"


def test_unsupported_local_extents():
    # 32^3 over a 2x4 mesh: local extents far below the block sizes
    ns = _solver((32, 32, 32))
    dmesh = make_device_mesh(2, 4)
    assert not sharded_transeq_v3_supported(ns, dmesh)


def test_repencilled_pressure_matches_single():
    """Repencilled slab projection (all-to-all to x-sharded + merged
    kernel) vs the single-device fused einsum projection."""
    from x3d2_tpu.parallel.shard_kernels import (make_repencilled_pressure,
                                                repencil_supported)
    from x3d2_tpu.parallel.topo import shard_state
    dims = (64, 128, 256)
    ns = _solver(dims)
    dmesh = make_device_mesh(2, 2)
    assert repencil_supported(ns, dmesh)
    fn = make_repencilled_pressure(ns, dmesh, terms=2, interpret=True)
    rng = np.random.default_rng(9)
    u, v, w = (jnp.asarray(rng.standard_normal(dims), jnp.float32)
               for _ in range(3))
    st = shard_state(dmesh, {"u": u, "v": v, "w": w})
    got = jax.jit(lambda a, b, c: fn(a, b, c, True))(
        st["u"], st["v"], st["w"])
    want = ns.pressure_correction(u, v, w, keep_pressure=True)
    for g, e, name in zip(got, want, ("u", "v", "w", "p")):
        scale = float(jnp.max(jnp.abs(e))) + 1e-30
        err = float(jnp.max(jnp.abs(g - e)))
        assert err < 3e-4 * scale, f"{name}: {err:.2e} vs {scale:.2e}"


def _collective_census(hlo_text):
    """Count XLA collectives in a compiled-module dump (HLO op names,
    incl. the async -start variants)."""
    import re
    census = {}
    for op in ("all-gather", "all-reduce", "all-to-all",
               "collective-permute", "reduce-scatter"):
        census[op] = len(re.findall(rf"\b{op}(?:-start)?\(", hlo_text))
    return census


def test_sharded_step_with_kernels_matches_single():
    """One full sharded AB3 step at a size where the repencilled
    projection and the per-shard x-apply kernels are both active,
    against the single-device step — plus a collective-regression census
    on the compiled HLO: the production sharded step must communicate
    through ppermute halos and repencilling all-to-alls only (the
    explicit-comm discipline of the reference's neighbour exchanges,
    omp/sendrecv.f90:10-36); an all-gather or reduce-scatter appearing
    means GSPMD regressed to re-replicating a field."""
    from x3d2_tpu.cases import SolverParams, TGVCase
    from x3d2_tpu.parallel.topo import make_sharded_step

    def case():
        mesh = Mesh((64, 128, 256), (2 * np.pi,) * 3,
                    ((BC.PERIODIC, BC.PERIODIC),) * 3)
        return TGVCase(mesh, SolverParams(Re=1600.0, time_intg="AB3",
                                          dt=1e-3),
                       dtype=jnp.float32, monitor_path=None, verbose=False)

    ca = case()
    sa = ca.step_fn(ca.initial_state())

    cb = case()
    dmesh = make_device_mesh(2, 2)
    step, sb = make_sharded_step(cb, dmesh)
    assert getattr(cb.solver, "_repencil_pressure", None) is None  # copy
    compiled = step.lower(sb).compile()
    census = _collective_census(compiled.as_text())
    assert census["collective-permute"] > 0, census   # ppermute halos
    assert census["all-to-all"] > 0, census           # repencilling
    assert census["all-gather"] == 0, census
    assert census["reduce-scatter"] == 0, census
    sb = compiled(sb)
    uscale = float(jnp.max(jnp.abs(sa["u"])))  # w starts at 0 in TGV
    for k in ("u", "v", "w"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        assert err < 3e-4 * uscale, f"{k}: {err:.2e}"

    # multi-step trajectory parity: halo/offset bugs that COMPOUND over
    # steps (e.g. the r4 wrapped-halo double count) can hide in one-step
    # noise — chase the KE series over >= 10 steps instead (the
    # reference's distributed checks run real multi-rank trajectories,
    # tests/verification/test_omp_tridiag.f90)
    def ke(s):
        return float(0.5 * jnp.mean(s["u"] ** 2 + s["v"] ** 2
                                    + s["w"] ** 2))

    ke_errs = []
    for _ in range(9):
        sa = ca._step(sa)
        sb = compiled(sb)
        ke_errs.append(abs(ke(sb) - ke(sa)) / ke(sa))
    assert max(ke_errs) < 1e-4, f"KE series rel err {ke_errs}"


def test_repencil_gate_rejects_untileable_locals():
    """Local nz below the x-apply lane tile must reject the repencilled
    projection (it previously produced uninitialised output buffers)."""
    from x3d2_tpu.parallel.shard_kernels import repencil_supported
    ns = _solver((64, 128, 128))
    dmesh = make_device_mesh(2, 2)   # nz_loc = 64 < 128
    assert not repencil_supported(ns, dmesh)


@pytest.mark.skipif("X3D2_AOT" not in __import__("os").environ,
                    reason="slow TPU-compiler invocation; set X3D2_AOT=1")
def test_aot_tpu_topology_full_step():
    """AOT-compile the full sharded step for a deviceless v5e 2x4
    topology (tools/aot_tpu_check.py): catches Mosaic/SPMD lowering
    errors of the halo-ext kernels without multi-chip hardware, and
    enforces the collective census against the REAL TPU compiler.
    Run in a subprocess: the check needs x64 off and its own jax init."""
    import os
    import subprocess
    import sys
    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run([sys.executable, "tools/aot_tpu_check.py"],
                       cwd=root, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr


def test_sharded_x_apply_matches_dense():
    from x3d2_tpu.parallel.shard_kernels import (sharded_x_apply_supported,
                                                wrap_x_ops)
    from x3d2_tpu.parallel.topo import shard_state
    dims = (64, 128, 256)
    ns = _solver(dims)
    dmesh = make_device_mesh(2, 2)
    assert sharded_x_apply_supported(ns, dmesh)
    bundle = wrap_x_ops(ns, dmesh, terms=2, interpret=True)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    fs = shard_state(dmesh, {"u": f})["u"]
    for name in ("der1st", "stagder_v2p", "interpl_p2v"):
        got = jax.jit(lambda x, n=name: getattr(bundle, n)(x, 0))(fs)
        want = getattr(ns.ops[0], name)(f, 0)
        scale = float(jnp.max(jnp.abs(want)))
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 5e-5 * scale, f"{name}: {err:.2e}"


def _collective_bytes(hlo_text):
    """Sum output bytes of each collective op class in a compiled HLO
    dump (tuple-shaped outputs summed element-wise; async -start
    variants counted once, -done excluded by the regex)."""
    import re
    DT = {"f32": 4, "f64": 8, "bf16": 2}

    def shape_bytes(s):
        m = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not m or m.group(1) not in DT:
            return 0
        nel = 1
        for d in m.group(2).split(","):
            if d:
                nel *= int(d)
        return nel * DT[m.group(1)]

    out = {}
    for op in ("collective-permute", "all-to-all"):
        tot = cnt = 0
        for m in re.finditer(
                rf"= ((?:\([^)]*\)|\S+)) {op}(?:-start)?\(", hlo_text):
            parts = re.findall(r"\w+\[[\d,]*\][^,)]*", m.group(1))
            tot += sum(shape_bytes(p) for p in parts)
            cnt += 1
        out[op] = (cnt, tot)
    return out


def test_collective_byte_volumes_match_scaling_model():
    """docs/SCALING.md's per-step communication inventory must be
    checkable, not narrative (VERDICT r3 #5c): at a sharded-v3-active
    size the compiled production step's collectives carry EXACTLY the
    modelled byte volumes —

        V_halo = 3 fields * 2 sides * (wy*nx*nz_loc + wz*nx*ny_loc) * B
        V_a2a  = 7 fields * (n^3/P) * [(py-1)/py + (pz-1)/pz] * B

    (all-to-all HLO outputs carry the full local operand; the moved
    fraction is (p-1)/p per axis, which the model already folds in)."""
    from x3d2_tpu.cases import SolverParams, TGVCase
    from x3d2_tpu.parallel.topo import make_sharded_step
    from x3d2_tpu.parallel.shard_kernels import (
        repencil_supported, sharded_transeq_v3_supported)

    nx, ny, nz = 128, 256, 256
    py = pz = 2
    mesh = Mesh((nx, ny, nz), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    case = TGVCase(mesh, SolverParams(Re=1600.0, time_intg="AB3",
                                      dt=1e-3),
                   dtype=jnp.float32, monitor_path=None, verbose=False)
    dmesh = make_device_mesh(py, pz)
    assert sharded_transeq_v3_supported(case.solver, dmesh)
    assert repencil_supported(case.solver, dmesh)
    step, sb = make_sharded_step(case, dmesh)
    got = _collective_bytes(step.lower(sb).compile().as_text())

    B = 4
    wy, wz = 16, 64   # terms=2 halo widths (docs/SCALING.md)
    V_halo = 3 * 2 * (wy * nx * (nz // pz) + wz * nx * (ny // py)) * B
    cnt_p, bytes_p = got["collective-permute"]
    assert cnt_p == 12, got          # 3 fields x 2 sides x 2 axes
    assert bytes_p == V_halo, (bytes_p, V_halo)

    P = py * pz
    V_a2a = int(7 * (nx * ny * nz // P)
                * ((py - 1) / py + (pz - 1) / pz) * B)
    cnt_a, bytes_a = got["all-to-all"]
    assert cnt_a == 14, got          # 7 fields x 2 tiled axis steps
    moved = bytes_a * (py - 1) // py  # symmetric mesh: same per axis
    assert moved == V_a2a, (moved, V_a2a)


def test_repencil_einsum_mid_matches_kernel_mid(monkeypatch):
    """The XLA einsum mid (make_mid_local.einsum — the 1024^3 path,
    where full-plane Pallas mids exceed the VMEM cap) replays the same
    stage bodies on the same split matrices, so the repencilled
    projection must match the kernel-mid variant near bit-exactly and
    the single-device projection at the usual f32 tolerance."""
    from x3d2_tpu.parallel.shard_kernels import (make_repencilled_pressure,
                                                repencil_supported)
    from x3d2_tpu.parallel.topo import shard_state
    dims = (64, 128, 256)
    ns = _solver(dims)
    dmesh = make_device_mesh(2, 2)
    assert repencil_supported(ns, dmesh)
    rng = np.random.default_rng(11)
    u, v, w = (jnp.asarray(rng.standard_normal(dims), jnp.float32)
               for _ in range(3))
    st = shard_state(dmesh, {"u": u, "v": v, "w": w})

    fn_k = make_repencilled_pressure(ns, dmesh, terms=2, interpret=True)
    got_k = jax.jit(lambda a, b, c: fn_k(a, b, c, True))(
        st["u"], st["v"], st["w"])
    monkeypatch.setenv("X3D2_EINSUM_MID", "1")
    fn_e = make_repencilled_pressure(ns, dmesh, terms=2, interpret=True)
    got_e = jax.jit(lambda a, b, c: fn_e(a, b, c, True))(
        st["u"], st["v"], st["w"])

    want = ns.pressure_correction(u, v, w, keep_pressure=True)
    for ge, gk, e, name in zip(got_e, got_k, want, ("u", "v", "w", "p")):
        scale = float(jnp.max(jnp.abs(e))) + 1e-30
        d_mid = float(jnp.max(jnp.abs(ge - gk)))
        assert d_mid < 2e-6 * scale, f"{name} vs kernel mid: {d_mid:.2e}"
        err = float(jnp.max(jnp.abs(ge - e)))
        assert err < 3e-4 * scale, f"{name}: {err:.2e} vs {scale:.2e}"


def test_repencil_tiled_mid_matches_kernel_mid(monkeypatch):
    """When the full-plane Pallas mid fails the VMEM gate (1024^2
    planes) but the fast-path structure holds, the repencilled
    projection must select the y/z-TILED mid kernels — not the einsum
    replay — and match both the kernel-mid variant and the
    single-device projection. The VMEM gate is forced closed here to
    exercise the selection on a test-sized grid."""
    import x3d2_tpu.ops.pallas_poisson as pp
    from x3d2_tpu.parallel.shard_kernels import (make_repencilled_pressure,
                                                repencil_supported)
    from x3d2_tpu.parallel.topo import shard_state
    dims = (64, 128, 256)
    ns = _solver(dims)
    dmesh = make_device_mesh(2, 2)
    rng = np.random.default_rng(29)
    u, v, w = (jnp.asarray(rng.standard_normal(dims), jnp.float32)
               for _ in range(3))
    st = shard_state(dmesh, {"u": u, "v": v, "w": w})

    fn_k = make_repencilled_pressure(ns, dmesh, terms=2, interpret=True)
    got_k = jax.jit(lambda a, b, c: fn_k(a, b, c, True))(
        st["u"], st["v"], st["w"])

    orig = pp.slab_pressure_supported

    def vmem_gate_closed(ns_, terms=3, structure_only=False):
        return structure_only and orig(ns_, terms, structure_only=True)

    monkeypatch.setattr(pp, "slab_pressure_supported", vmem_gate_closed)
    assert repencil_supported(ns, dmesh)
    fn_t = make_repencilled_pressure(ns, dmesh, terms=2, interpret=True)
    got_t = jax.jit(lambda a, b, c: fn_t(a, b, c, True))(
        st["u"], st["v"], st["w"])

    want = ns.pressure_correction(u, v, w, keep_pressure=True)
    for gt, gk, e, name in zip(got_t, got_k, want, ("u", "v", "w", "p")):
        scale = float(jnp.max(jnp.abs(e))) + 1e-30
        d_mid = float(jnp.max(jnp.abs(gt - gk)))
        assert d_mid < 1e-4 * scale, f"{name} vs kernel mid: {d_mid:.2e}"
        err = float(jnp.max(jnp.abs(gt - e)))
        assert err < 3e-4 * scale, f"{name}: {err:.2e} vs {scale:.2e}"
