"""Stretched-y spectral Poisson operator verification.

The 'centred' and 'top-bottom' stretchings (the ones the reference's
examples use, examples/channel/input.x3d:20) must satisfy the
div(grad(solve(f))) roundtrip to near machine precision, like the
uniform-mesh variants.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC, DataLoc
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.cases import ChannelCase, SolverParams
from x3d2_tpu.config import ChannelConfig


def make(stretching, beta=0.259065151):
    mesh = Mesh((32, 33, 32), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", stretching, "uniform"),
                beta=(1.0, beta, 1.0))
    return mesh, NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64)


@pytest.mark.parametrize("stretching", ["top-bottom", "centred", "bottom"])
def test_stretched_poisson_roundtrip(stretching):
    mesh, ns = make(stretching)
    X, Y, Z = mesh.coord_grids(DataLoc.CELL)
    f = (np.cos(2 * np.pi * X / 4.0) * np.cos(np.pi * Y / 2.0)
         * np.cos(2 * np.pi * Z / 2.0)
         + 0.3 * np.cos(4 * np.pi * X / 4.0))
    f = np.broadcast_to(f, mesh.dims(DataLoc.CELL)).copy()
    f -= f.mean()
    p = ns.poisson(jnp.asarray(f))
    lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
    err = lap - f
    err -= err.mean()
    assert np.max(np.abs(err)) < 1e-10, np.max(np.abs(err))


@pytest.mark.parametrize("stretching", ["top-bottom", "centred", "bottom"])
def test_stretched_roundtrip_multimode(stretching):
    """Eight cosine cases per stretching (reference test_poisson_bc.f90
    breadth): mixed x/y/z harmonics including x- and z-Nyquist-adjacent
    modes and high half-cosine y modes — single-mode roundtrips miss
    mode-indexing bugs in the eigen-resolved stretched solve."""
    mesh, ns = make(stretching)
    X, Y, Z = mesh.coord_grids(DataLoc.CELL)
    Lx, Ly, Lz = mesh.L
    n = 32
    for mx, my, mz in [(1, 1, 1), (2, 1, 3), (1, 4, 2), (5, 3, 7),
                       (n // 2, 1, 2), (1, n - 1, 1), (2, 3, n // 2),
                       (7, 30, 5)]:
        f = (np.cos(2 * np.pi * mx * X / Lx)
             * np.cos(np.pi * my * Y / Ly)
             * np.cos(2 * np.pi * mz * Z / Lz))
        f = f - f.mean()
        p = ns.poisson(jnp.asarray(f))
        lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
        err = lap - f
        err -= err.mean()
        m = np.max(np.abs(err))
        assert m < 1e-9, f"{stretching} mode ({mx},{my},{mz}): {m:.2e}"


@pytest.mark.parametrize("stretching", ["top-bottom", "centred", "bottom"])
def test_eigen_resolution_active(stretching):
    """The stretched-y solve must actually resolve to the eigen-basis
    diagonal form (transform-folded matrices + separable waves tables) —
    a silent fallback to the lax.scan path would pass the roundtrip but
    lose the kernelized projection (VERDICT r3 item 3)."""
    _, ns = make(stretching)
    po = ns.poisson
    assert po.stretch_resolved
    assert po.stretch_solver is None
    # the fused projection matrices must therefore be available
    assert ns._fp_mats64() is not None


@pytest.mark.parametrize("stretching", ["top-bottom", "centred", "bottom"])
def test_eigen_vs_scan_solver_equivalence(stretching, monkeypatch):
    """The eigen-resolved solve equals the guarded-elimination (scan)
    port of the reference kernel on every mode except the pressure-gauge
    constant (where the elimination pins x0=r0 and the eigen path zeroes
    the null-mode coefficient — a pure additive constant)."""
    _, ns_eig = make(stretching)
    monkeypatch.setenv("X3D2_STRETCH_EIG", "0")
    _, ns_scan = make(stretching)
    assert ns_scan.poisson.stretch_solver is not None
    rng = np.random.default_rng(7)
    f = rng.standard_normal(ns_eig.mesh.dims(DataLoc.CELL))
    f -= f.mean()
    p_e = np.asarray(ns_eig.poisson(jnp.asarray(f)))
    p_s = np.asarray(ns_scan.poisson(jnp.asarray(f)))
    d = p_e - p_s
    d -= d.mean()  # gauge-mode difference only
    scale = max(np.abs(p_s).max(), 1.0)
    assert np.abs(d).max() < 1e-9 * scale, np.abs(d).max()


def test_bottom_first_row_correction():
    """The 'bottom' spectral path only satisfies the roundtrip with the
    corrected first-row assembly (the upstream branch at
    poisson_fft.f90:360-387 drops the aliased k=-1/k=-2 couplings; see
    tools/adjudicate_bottom.py). Halving A[0,1], A[0,2] back to the
    literal upstream values must break the roundtrip by ~1e-4-scale
    errors — this pins the deviation as load-bearing."""
    from x3d2_tpu.ops import stretched_poisson as sp
    orig = sp.build_stretch_matrices

    def upstream(*args, **kw):
        a_sets, offsets, inc = orig(*args, **kw)
        if inc == 1:  # 'bottom': undo the first-row aliasing correction
            keep = (a_sets[0][0, 0, 0, 2] == 1.0)
            a_sets[0][:, 0, :, 3] /= 2.0
            a_sets[0][:, 0, :, 4] /= 2.0
            if keep:
                a_sets[0][0, 0, 0, 3] = 0.0
                a_sets[0][0, 0, 0, 4] = 0.0
        return a_sets, offsets, inc

    sp.build_stretch_matrices = upstream
    try:
        import x3d2_tpu.ops.matmul_poisson as mp
        mesh, ns = make("bottom")
    finally:
        sp.build_stretch_matrices = orig
    X, Y, Z = mesh.coord_grids(DataLoc.CELL)
    f = np.cos(2 * np.pi * X / 4.0) * np.cos(np.pi * Y / 2.0) \
        * np.cos(2 * np.pi * Z / 2.0)
    f = np.broadcast_to(f, mesh.dims(DataLoc.CELL)).copy()
    f -= f.mean()
    p = ns.poisson(jnp.asarray(f))
    lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
    err = lap - f
    err -= err.mean()
    assert np.max(np.abs(err)) > 1e-6, (
        "literal upstream assembly unexpectedly passes the roundtrip")


def test_bottom_cg_still_available():
    """poisson_method='cg' (preconditioned BiCGStab) remains usable for
    'bottom' stretching (reference's CG type is a stub, solver.f90:
    680-691; ours is a real solver)."""
    from x3d2_tpu.ops.cg_poisson import CGPoisson
    mesh = Mesh((16, 17, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", "bottom", "uniform"),
                beta=(1.0, 0.259065151, 1.0))
    ns = NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64,
                            poisson_method="cg")
    assert isinstance(ns.poisson, CGPoisson)
    X, Y, Z = mesh.coord_grids(DataLoc.CELL)
    f = np.cos(2 * np.pi * X / 4.0) * np.cos(np.pi * Y / 2.0) \
        * np.cos(2 * np.pi * Z / 2.0)
    f = np.broadcast_to(f, mesh.dims(DataLoc.CELL)).copy()
    f -= f.mean()
    p = ns.poisson(jnp.asarray(f))
    lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
    err = lap - f
    err -= err.mean()
    assert np.max(np.abs(err)) < 1e-9, np.max(np.abs(err))


def test_channel_bottom_end_to_end():
    """A 'bottom'-stretched channel (one-sided wall clustering) runs the
    full case loop — no reference-supported input is rejected."""
    mesh = Mesh((16, 17, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", "bottom", "uniform"),
                beta=(1.0, 0.259065151, 1.0))
    params = SolverParams(Re=4200.0, time_intg="RK3", dt=1e-3)
    case = ChannelCase(mesh, params, dtype=jnp.float64,
                       monitor_path=None, verbose=False,
                       case_cfg=ChannelConfig(
                           init_noise=(0.01, 0.01, 0.01)))
    state = case.run(n_iters=3, state=case.initial_state(), n_output=10**9)
    assert np.isfinite(np.asarray(state["u"])).all()


def test_stretched_mesh_metrics():
    """Stretching metric identities: d(coord)/d(index) ~ d/ds (chain rule
    consistency of the analytic tangent map, mesh_content.f90:142-253)."""
    mesh, _ = make("top-bottom")
    g = mesh.geo[1]
    y = g.vert_coords
    # numerical dy/d(eta*L) vs 1/ds (ds = d eta_comp/dy scale factor)
    dy = np.gradient(y, g.d)
    # vert_ds is ds/dy in solver convention: dy/d(s) * vert_ds ~= 1
    # np.gradient is only 2nd-order; identity holds to discretisation error
    assert np.allclose(dy[2:-2] * g.vert_ds[2:-2], 1.0, atol=5e-2)
    # wall clustering: spacing at walls much smaller than centre
    assert (y[1] - y[0]) < 0.4 * (y[len(y) // 2 + 1] - y[len(y) // 2])
    # domain covers [0, L]
    assert abs(y[0]) < 1e-12 and abs(y[-1] - 2.0) < 1e-9


def test_channel_case_stretched_runs():
    """The reference channel headline config: stretched top-bottom y wall
    clustering with RK3 (examples/channel/input.x3d)."""
    mesh = Mesh((16, 17, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", "top-bottom", "uniform"),
                beta=(1.0, 0.259065151, 1.0))
    params = SolverParams(Re=4200.0, time_intg="RK3", dt=1e-3)
    case = ChannelCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                       verbose=False,
                       case_cfg=ChannelConfig(init_noise=(0.01, 0.01, 0.01)))
    state = case.run(n_iters=3, state=case.initial_state(), n_output=10**9)
    u = np.asarray(state["u"])
    assert np.isfinite(u).all()
    ncell = np.prod(mesh.global_cell_dims)
    assert abs(u.sum() / ncell - 2.0 / 3.0) < 0.1
