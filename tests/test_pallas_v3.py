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
