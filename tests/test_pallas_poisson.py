"""Resident-slab pressure kernels vs the einsum fused path.

Runs the Pallas kernels in interpret mode on CPU (same bf16 hi/lo split
arithmetic as on the TPU, minus the Mosaic lowering) and checks the full
pressure_grads output against the einsum path, which on CPU computes the
same HIGH-precision contractions in full f32.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_poisson import (make_pressure_slab,
                                         slab_pressure_supported)

PER = (BC.PERIODIC, BC.PERIODIC)
NEU = (BC.NEUMANN, BC.NEUMANN)


def _build(bcs, dims=(16, 128, 128)):
    mesh = Mesh(dims, (2 * np.pi,) * 3, bcs)
    return NavierStokes.build(mesh, nu=0.01, dtype=jnp.float32)


def _fields(ns, seed=3):
    rng = np.random.default_rng(seed)
    shape = ns.mesh.dims(0)
    return tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32)
                 for _ in range(3))


@pytest.mark.parametrize("bcs,label", [
    ((PER, PER, PER), "000"),
    ((NEU, PER, PER), "100"),
])
def test_slab_matches_einsum(bcs, label):
    ns = _build(bcs)
    assert slab_pressure_supported(ns)
    u, v, w = _fields(ns)

    ref = ns.pressure_grads(u, v, w, keep_pressure=True)

    fns = make_pressure_slab(ns, terms=2, interpret=True)
    object.__setattr__(ns, "_slab_pressure", fns)
    got = ns.pressure_grads(u, v, w, keep_pressure=True)

    for r, g, name in zip(ref, got, ("dpdx", "dpdy", "dpdz", "p")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        err = float(jnp.max(jnp.abs(r - g))) / scale
        assert err < 2e-4, f"{label}/{name}: rel err {err:.2e}"


def test_slab_correction_matches_einsum():
    """pressure_correction with the fused-subtract x-stage kernels."""
    ns = _build((PER,) * 3)
    u, v, w = _fields(ns, seed=5)
    ref = ns.pressure_correction(u, v, w, keep_pressure=True)
    fns = make_pressure_slab(ns, terms=2, interpret=True)
    object.__setattr__(ns, "_slab_pressure", fns)
    got = ns.pressure_correction(u, v, w, keep_pressure=True)
    for r, g, name in zip(ref, got, ("u", "v", "w", "p")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        err = float(jnp.max(jnp.abs(r - g))) / scale
        assert err < 2e-4, f"{name}: rel err {err:.2e}"


def test_unsupported_falls_back():
    # lane extent not a 128 multiple -> slab gate must reject
    ns = _build((PER,) * 3, dims=(16, 128, 192))
    assert not slab_pressure_supported(ns)


def test_slab_projection_removes_divergence():
    """End-to-end: slab-kernel projection leaves a divergence-free field."""
    ns = _build((PER,) * 3)
    fns = make_pressure_slab(ns, terms=2, interpret=True)
    object.__setattr__(ns, "_slab_pressure", fns)
    u, v, w = _fields(ns, seed=11)
    div0 = float(jnp.max(jnp.abs(ns.divergence_v2p(u, v, w))))
    uc, vc, wc, _ = ns.pressure_correction(u, v, w, keep_pressure=False)
    div = float(jnp.max(jnp.abs(ns.divergence_v2p(uc, vc, wc))))
    # residual bounded by the bf16x3 matmul noise (~1e-5 relative)
    assert div < 2e-4 * div0, f"residual div {div:.2e} vs initial {div0:.2e}"


def test_mid_no_q_matches_mid():
    """The no-q mid-kernel variant (keep_pressure=False production steps)
    produces bit-identical gradient slabs to the q-emitting kernel."""
    ns = _build((PER,) * 3)
    fns = make_pressure_slab(ns, terms=2, interpret=True)
    object.__setattr__(ns, "_slab_pressure", fns)
    u, v, w = _fields(ns, seed=7)
    full = ns._slab_mid(u, v, w, want_q=True)
    noq = ns._slab_mid(u, v, w, want_q=False)
    assert noq[0] is None
    for a, b, name in zip(full[1:], noq[1:], ("p_zy", "dpdy", "dpdz")):
        assert jnp.array_equal(a, b), name
    # and the keep_pressure=False projection returns p=None on this path
    uc, vc, wc, p = ns.pressure_correction(u, v, w, keep_pressure=False)
    assert p is None


def test_merged_x_kernels_match_separate(monkeypatch):
    """The merged 3-field x-stage kernels (div3 / gradsub3, one
    pallas_call with 6/9 concurrent streams) are bit-identical to the
    per-field parity kernels — same split arithmetic, different DMA
    pipelining; X3D2_MERGED_X=0 drops them."""
    monkeypatch.delenv("X3D2_MERGED_X", raising=False)
    ns = _build((PER,) * 3)
    fns = make_pressure_slab(ns, terms=2, interpret=True)
    xk = fns[2]
    assert "div3" in xk and "gradsub3" in xk
    u, v, w = _fields(ns, seed=13)
    du, dv, dw = xk["div3"](u, v, w)
    assert jnp.array_equal(du, xk["sx"](u))
    assert jnp.array_equal(dv, xk["ix"](v))
    assert jnp.array_equal(dw, xk["ix"](w))
    un, vn, wn = xk["gradsub3"](du, dv, dw, u, v, w)
    assert jnp.array_equal(un, xk["gx_s_sub"](du, u))
    assert jnp.array_equal(vn, xk["gx_i_sub"](dv, v))
    assert jnp.array_equal(wn, xk["gx_i_sub"](dw, w))
    monkeypatch.setenv("X3D2_MERGED_X", "0")
    fns2 = make_pressure_slab(ns, terms=2, interpret=True)
    assert "div3" not in fns2[2]


@pytest.mark.parametrize("terms", [2, 3])
def test_pipe3_matches_production_chain(terms):
    """The 3-stage pipeline (slab div -> x+solve kernel -> slab
    grad+correction) equals the x-first chain (div3 -> mid -> gradsub3)
    to matmul noise at BOTH precision modes (bf16x3 and the bf16x6
    KE-parity mode), and the corrected field is divergence-free."""
    from x3d2_tpu.ops.pallas_poisson import (make_pressure_pipe3,
                                             pipe3_supported)
    ns = _build((PER,) * 3)
    assert pipe3_supported(ns, terms=terms)
    u, v, w = _fields(ns, seed=17)
    fns = make_pressure_slab(ns, terms=terms, interpret=True)
    object.__setattr__(ns, "_slab_pressure", fns)
    ref = ns.pressure_correction(u, v, w, keep_pressure=False)
    pipe = make_pressure_pipe3(ns, terms=terms, interpret=True)
    got = pipe(u, v, w)
    for r, g, name in zip(ref[:3], got, ("u", "v", "w")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        err = float(jnp.max(jnp.abs(r - g))) / scale
        assert err < 2e-4, f"{name}: rel err {err:.2e}"
    div0 = float(jnp.max(jnp.abs(ns.divergence_v2p(u, v, w))))
    div = float(jnp.max(jnp.abs(ns.divergence_v2p(*got))))
    assert div < 2e-4 * div0
    # the solver wires it for keep_pressure=False only
    object.__setattr__(ns, "_pipe_pressure", pipe)
    un, vn, wn, p = ns.pressure_correction(u, v, w, keep_pressure=False)
    assert p is None and jnp.array_equal(un, got[0])
    uk, _, _, pk = ns.pressure_correction(u, v, w, keep_pressure=True)
    assert pk is not None


@pytest.mark.parametrize("terms", [2, 3])
def test_tiled_mid_matches_merged_mid(terms):
    """The y/z-tiled mid kernels (the large-plane path: VMEM scales with
    tile size, keeping the kernel projection active at 1024^2 planes)
    reorder the merged mid's commuting y-/z-stage operators, so they
    must match the full-plane mid to reassociation-level noise on the
    same inputs and solve tables."""
    ns = _build((PER,) * 3)
    fns = make_pressure_slab(ns, terms=terms, interpret=True)
    mk = fns[4]
    assert mk.tiled_supported
    nx = ns.poisson.nc[0]
    ny, nz = ns.poisson.nc[1], ns.poisson.nc[2]
    rng = np.random.default_rng(23)
    du, dv, dw = (jnp.asarray(rng.standard_normal((nx, ny, nz)),
                              jnp.float32) for _ in range(3))
    k2x, tx2, mx = mk.tables[3:6]
    ref = mk(nx)(du, dv, dw, k2x, tx2, mx)
    got = mk.tiled(nx)(du, dv, dw, k2x, tx2, mx)
    for r, g, name in zip(ref, got, ("q", "p_zy", "dpdy", "dpdz")):
        assert r.shape == g.shape, name
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        err = float(jnp.max(jnp.abs(r - g))) / scale
        assert err < 1e-4, f"{name}: rel err {err:.2e}"
