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
