"""v3 species sweeps: interpret-mode equivalence vs the operator path.

The species kernels (ops/pallas_kernels.py make_fused_species_v3) run
all species through one conv-window read per direction with manual
bf16x3 matmuls, so the tolerance is the bf16x3 noise floor (~1e-5
relative) like the momentum v3 tests. Mirrors the reference's species
verification (tests/verification/test_omp_transeq_species.f90 ethos;
transeq_species semantics from solver.f90:507-601).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.pallas_kernels import (make_fused_species_v3,
                                         make_species_dir_v3)

SHAPE = (128, 128, 256)
NUS = (1 / 1600, 1 / 400)


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(SHAPE, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32,
                            nu_species=NUS)
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 5)
    u, v, w = (jax.random.normal(k, SHAPE, jnp.float32) for k in ks[:3])
    phis = tuple(jax.random.normal(k, SHAPE, jnp.float32)
                 for k in ks[3:])
    return ns, (u, v, w), phis


def _ref_rhs(ns, phis, comps):
    return [sum(
        -0.5 * (comps[a] * ns.ops[a].der1st(q, a)
                + ns.ops[a].der1st_sym(q * comps[a], a))
        + nu_s * ns.ops[a].der2nd(q, a)
        for a in range(3))
        for q, nu_s in zip(phis, NUS)]


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_species_dir_matches_ops(setup, axis):
    ns, comps, phis = setup
    fn = make_species_dir_v3(ns.ops[axis], NUS, axis, SHAPE,
                             interpret=True)
    outs = fn(phis, comps[axis])
    for s, (q, nu_s) in enumerate(zip(phis, NUS)):
        o = ns.ops[axis]
        ref = (-0.5 * (comps[axis] * o.der1st(q, axis)
                       + o.der1st_sym(q * comps[axis], axis))
               + nu_s * o.der2nd(q, axis))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        err = float(jnp.max(jnp.abs(outs[s] - ref)))
        assert err < 2e-5 * scale, f"axis {axis} sp {s}: {err:.2e}"


def test_fused_species_chain(setup):
    ns, comps, phis = setup
    fn = make_fused_species_v3(ns.ops, NUS, SHAPE, interpret=True)
    outs = fn(phis, *comps)
    refs = _ref_rhs(ns, phis, comps)
    assert len(outs) == len(phis)
    for s, ref in enumerate(refs):
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        err = float(jnp.max(jnp.abs(outs[s] - ref)))
        assert err < 5e-5 * scale, f"species {s}: {err:.2e}"


def test_fused_species_chain_highest_terms3(setup):
    """bf16x6 species sweeps (the KE-parity production mode) sit well
    below the bf16x3 noise floor."""
    ns, comps, phis = setup
    fn = make_fused_species_v3(ns.ops, NUS, SHAPE, interpret=True,
                               terms=3)
    outs = fn(phis, *comps)
    c64 = tuple(np.asarray(q, np.float64) for q in comps)
    for s, (q, nu_s) in enumerate(zip(phis, NUS)):
        q64 = np.asarray(q, np.float64)
        ref = 0.0
        for axis in range(3):
            o = ns.ops[axis]
            conv = c64[axis]
            dq = np.moveaxis(np.tensordot(
                np.asarray(o.der1st.M64), q64, axes=([1], [axis])),
                0, axis)
            dqd = np.moveaxis(np.tensordot(
                np.asarray(o.der1st_sym.M64), q64 * conv,
                axes=([1], [axis])), 0, axis)
            d2q = np.moveaxis(np.tensordot(
                np.asarray(o.der2nd.M64), q64, axes=([1], [axis])),
                0, axis)
            ref = ref - 0.5 * (conv * dq + dqd) + nu_s * d2q
        scale = np.max(np.abs(ref))
        err = float(np.max(np.abs(np.asarray(outs[s], np.float64)
                                  - ref)))
        assert err < 5e-7 * scale, f"species {s}: {err:.2e}"


def test_sharded_species_matches_operator(setup):
    """Sharded species sweeps (shard_map + ppermute halos, interpret
    mode) vs the global operator path on the virtual CPU device mesh —
    like the sharded momentum tests (tests/test_shard_kernels.py)."""
    from x3d2_tpu.parallel.topo import make_device_mesh
    from x3d2_tpu.parallel.shard_kernels import make_sharded_species_v3
    dims = (128, 256, 256)   # local (128, 128, 128) on the 2x2 mesh
    mesh = Mesh(dims, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32,
                            nu_species=NUS)
    rng = np.random.default_rng(11)
    comps = tuple(jnp.asarray(rng.standard_normal(dims), jnp.float32)
                  for _ in range(3))
    phis = tuple(jnp.asarray(rng.standard_normal(dims), jnp.float32)
                 for _ in range(2))
    dmesh = make_device_mesh(2, 2)
    fn = make_sharded_species_v3(ns, dmesh, terms=2, interpret=True)
    outs = jax.jit(lambda p, u, v, w: fn(p, u, v, w))(phis, *comps)
    refs = _ref_rhs(ns, phis, comps)
    for s, ref in enumerate(refs):
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        err = float(jnp.max(jnp.abs(outs[s] - ref)))
        assert err < 5e-5 * scale, f"species {s}: {err:.2e}"


def test_sharded_step_wires_species_kernels(monkeypatch):
    """make_sharded_step must select the standalone sharded species
    kernels (the merged momentum+species chain measured 0.63x on-chip
    in round 3 and was removed)."""
    from x3d2_tpu.cases import SolverParams, TGVCase
    from x3d2_tpu.parallel.topo import make_device_mesh, make_sharded_step
    mesh = Mesh((128, 256, 256), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                          n_species=2, pr_species=(0.7, 1.0))
    case = TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                   verbose=False)
    dmesh = make_device_mesh(2, 2)
    make_sharded_step(case, dmesh)
    ns = case._sharded_solver   # the solver the sharded step wired
    assert getattr(ns, "_species_v3", None) is not None
    # the caller's case/solver stay untouched (copies)
    assert getattr(case.solver, "_species_v3", None) is None


def test_sharded_species_rejects_untileable():
    """Local extents below the window sizes must raise (the sharded-step
    wiring then falls back to the operator path)."""
    from x3d2_tpu.parallel.topo import make_device_mesh
    from x3d2_tpu.parallel.shard_kernels import make_sharded_species_v3
    mesh = Mesh((64, 64, 128), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    ns = NavierStokes.build(mesh, 1 / 1600, dtype=jnp.float32,
                            nu_species=NUS)
    dmesh = make_device_mesh(2, 4)   # nz_loc = 32 < bs
    with pytest.raises(ValueError):
        make_sharded_species_v3(ns, dmesh, terms=2, interpret=True)


def test_transeq_species_all_dispatch(setup):
    """solver.transeq_species_all falls back to the operator path when
    no kernel is built, and matches it when one is injected."""
    ns, comps, phis = setup
    phi = jnp.stack(phis)
    base = ns.transeq_species_all(phi, *comps)
    refs = _ref_rhs(ns, phis, comps)
    for s, ref in enumerate(refs):
        assert float(jnp.max(jnp.abs(base[s] - ref))) < 1e-12
    object.__setattr__(ns, "_species_v3",
                       make_fused_species_v3(ns.ops, NUS, SHAPE,
                                             interpret=True))
    fast = ns.transeq_species_all(phi, *comps)
    for s, ref in enumerate(refs):
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        err = float(jnp.max(jnp.abs(fast[s] - ref)))
        assert err < 5e-5 * scale, f"species {s}: {err:.2e}"
