"""Pallas fused transeq kernel: must match the einsum path per direction
(interpret mode on CPU; the TPU-compiled path is exercised by bench)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_transeq import (make_fused_transeq,
                                         fused_transeq_supported)


@pytest.fixture(scope="module")
def setup():
    shape = (32, 128, 128)
    mesh = Mesh(shape, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    ns = NavierStokes.build(mesh, nu=1 / 1600, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    fields = tuple(jnp.asarray(rng.normal(size=shape)) for _ in range(3))
    return shape, ns, fields


def ref_direction(ns, axis, u, v, w):
    o = ns.ops[axis]
    comps = (u, v, w)
    conv = comps[axis]
    rhs = []
    for c in range(3):
        q = comps[c]
        if c == axis:
            op_du, op_dud, op_d2 = o.der1st, o.der1st_sym, o.der2nd
        else:
            op_du, op_dud, op_d2 = o.der1st_sym, o.der1st, o.der2nd_sym
        rhs.append(-0.5 * (conv * op_du(q, axis) + op_dud(q * conv, axis))
                   + ns.nu * op_d2(q, axis))
    return rhs


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_fused_matches_einsum(setup, axis):
    shape, ns, (u, v, w) = setup
    fn = make_fused_transeq(ns.ops[axis], ns.nu, axis, shape,
                            bs=16, interpret=True)
    got = fn(u, v, w)
    ref = ref_direction(ns, axis, u, v, w)
    for c in range(3):
        d = float(jnp.max(jnp.abs(got[c] - ref[c])))
        assert d < 1e-11, (axis, c, d)


def test_supported_predicate(setup):
    shape, ns, _ = setup
    assert fused_transeq_supported(ns, shape)
    assert not fused_transeq_supported(ns, (33, 128, 128))
