"""v3 Pallas fused transeq: interpret-mode equivalence vs the einsum path.

The v3 kernels (ops/pallas_kernels.py) use manual bf16x3 matmuls —
XLA Precision.HIGH equivalents — so the tolerance here is the bf16x3
noise floor (~1e-5 relative), not f32 epsilon. Mirrors the reference's
fused-kernel verification strategy (tests/verification/test_omp_transeq.f90).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_kernels import (make_fused_transeq_v3,
                                         make_transeq_dir_v3,
                                         transeq_v3_supported)


@pytest.fixture(scope="module")
def setup():
    shape = (128, 128, 256)
    mesh = Mesh(shape, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    u, v, w = (jax.random.normal(k, shape, jnp.float32)
               for k in jax.random.split(key, 3))
    return shape, ns, (u, v, w)


def _dir_reference(ns, comps, axis):
    o = ns.ops[axis]
    conv = comps[axis]
    outs = []
    for c in range(3):
        q = comps[c]
        if c == axis:
            d1, dd, d2 = o.der1st, o.der1st_sym, o.der2nd
        else:
            d1, dd, d2 = o.der1st_sym, o.der1st, o.der2nd_sym
        outs.append(-0.5 * (conv * d1(q, axis) + dd(q * conv, axis))
                    + ns.nu * d2(q, axis))
    return outs


def test_supported(setup):
    shape, ns, _ = setup
    assert transeq_v3_supported(ns, shape)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_dir_sweep_matches_einsum(setup, axis):
    shape, ns, comps = setup
    fn = make_transeq_dir_v3(ns.ops[axis], ns.nu, axis, shape,
                             interpret=True)
    outs = fn(*comps)
    for got, want in zip(outs, _dir_reference(ns, comps, axis)):
        scale = float(jnp.max(jnp.abs(want)))
        assert float(jnp.max(jnp.abs(got - want))) < 3e-5 * scale


def test_accumulated_full_transeq(setup):
    shape, ns, comps = setup
    fn = make_fused_transeq_v3(ns.ops, ns.nu, shape, interpret=True)
    outs = fn(*comps)
    want = ns.transeq(*comps)
    for g, e in zip(outs, want):
        scale = float(jnp.max(jnp.abs(e)))
        assert float(jnp.max(jnp.abs(g - e))) < 5e-5 * scale


def test_full_transeq_highest_terms3(setup):
    """bf16x6 (terms=3, the X3D2_MATMUL_PRECISION=highest KE-parity
    production mode) must track the f64 operator RHS well below the
    bf16x3 floor — this is the mode the measured 1.5e-10/step KE drift
    relies on (README accuracy table)."""
    shape, ns, comps = setup
    fn = make_fused_transeq_v3(ns.ops, ns.nu, shape, interpret=True,
                               terms=3)
    outs = fn(*comps)
    # f64 reference: resolve the operator applies in float64
    c64 = tuple(np.asarray(q, np.float64) for q in comps)
    for c, got in enumerate(outs):
        ref = 0.0
        for axis in range(3):
            o = ns.ops[axis]
            conv = c64[axis]
            q = c64[c]
            if c == axis:
                d1, dd, d2 = o.der1st, o.der1st_sym, o.der2nd
            else:
                d1, dd, d2 = o.der1st_sym, o.der1st, o.der2nd_sym
            M1 = np.concatenate([np.asarray(d1.M64), np.asarray(d2.M64)])
            both = np.moveaxis(
                np.tensordot(M1, q, axes=([1], [axis])), 0, axis)
            n1 = d1.n_out
            sl1 = [slice(None)] * 3
            sl1[axis] = slice(0, n1)
            sl2 = [slice(None)] * 3
            sl2[axis] = slice(n1, 2 * n1)
            dq = both[tuple(sl1)]
            d2q = both[tuple(sl2)]
            dqd = np.moveaxis(
                np.tensordot(np.asarray(dd.M64), q * conv,
                             axes=([1], [axis])), 0, axis)
            ref = ref - 0.5 * (conv * dq + dqd) + ns.nu * d2q
        scale = np.max(np.abs(ref))
        err = float(np.max(np.abs(np.asarray(got, np.float64) - ref)))
        # bf16x6 floor: ~1e-7 relative (vs ~1e-5 at bf16x3)
        assert err < 5e-7 * scale, f"comp {c}: {err:.2e} vs {scale:.2e}"
