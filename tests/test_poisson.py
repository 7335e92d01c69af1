"""Spectral Poisson solver verification.

Mirrors the reference's tests/verification/test_poisson_bc.f90 strategy:
cosine pressure fields per BC combination; check (a) the solve recovers the
analytic solution to scheme accuracy and (b) the round trip
div(grad(solve(f))) reproduces f to near machine precision (the spectral
operator is exactly consistent with the compact div/grad).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC, DataLoc
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes


def make_solver(nv, bcs, L):
    mesh = Mesh(global_vert_dims=nv, L=L, BCs=bcs)
    return mesh, NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64)


def cell_grids(mesh):
    return mesh.coord_grids(DataLoc.CELL)


def test_poisson_000_analytic():
    n = 32
    L = (2 * np.pi,) * 3
    bcs = ((BC.PERIODIC, BC.PERIODIC),) * 3
    mesh, ns = make_solver((n, n, n), bcs, L)
    X, Y, Z = cell_grids(mesh)
    # mean-free analytic solution
    p_ref = np.cos(X) * np.cos(2 * Y) * np.cos(Z)
    f = -(1 + 4 + 1) * p_ref  # continuous laplacian
    p = np.array(ns.poisson(jnp.asarray(f)))
    p -= p.mean()
    pr = p_ref - p_ref.mean()
    # modified-wavenumber operator ~= continuous laplacian at low k
    assert np.max(np.abs(p - pr)) < 1e-4


@pytest.mark.parametrize("bcs_x,bcs_y", [
    (BC.PERIODIC, BC.PERIODIC),    # 000
    (BC.PERIODIC, BC.NEUMANN),     # 010
    (BC.PERIODIC, BC.DIRICHLET),   # 010 (midpoint ops forced to Neumann)
    (BC.NEUMANN, BC.PERIODIC),     # 100
    (BC.DIRICHLET, BC.PERIODIC),   # 100
    (BC.NEUMANN, BC.NEUMANN),      # 110
    (BC.DIRICHLET, BC.DIRICHLET),  # 110
])
def test_poisson_roundtrip_div_grad_multimode(bcs_x, bcs_y):
    """Eight cosine cases per BC config, like the reference's
    test_poisson_bc.f90:1-60 (multi-mode coverage catches
    indexing-parity bugs a single mode misses). Includes single-axis
    Nyquist modes, which the reference kernels must NOT zero — only the
    (x-Nyquist, z-Nyquist) intersection line is masked
    (omp/kernels/spectral_processing.f90:216); the pre-round-4 mask
    wrongly zeroed the whole Nyquist planes."""
    n = 32
    bcs = ((bcs_x, bcs_x), (bcs_y, bcs_y),
           (BC.PERIODIC, BC.PERIODIC))
    nv = (n if bcs_x == BC.PERIODIC else n + 1,
          n if bcs_y == BC.PERIODIC else n + 1, n)
    L = (2 * np.pi,) * 3
    mesh, ns = make_solver(nv, bcs, L)
    X, Y, Z = cell_grids(mesh)
    Lx, Ly, Lz = mesh.L

    def axis_mode(coord, Lax, m, periodic):
        # periodic axes: full cosine harmonics (m up to Nyquist n/2);
        # folded axes: the Neumann-compatible half-cosines k pi y / L
        return (np.cos(2 * np.pi * m * coord / Lax) if periodic
                else np.cos(np.pi * m * coord / Lax))

    px = bcs_x == BC.PERIODIC
    py = bcs_y == BC.PERIODIC
    # 8 mode triples: low, mixed, odd/even mixtures, and single-axis
    # Nyquist-type modes (x and z Nyquist never together — that line is
    # legitimately projected out)
    hx = n // 2 if px else n - 1
    hy = n // 2 if py else n - 1
    cases = [(1, 1, 1), (2, 1, 3), (1, 4, 2), (5, 3, 7),
             (hx, 1, 2), (1, hy, 1), (2, 3, n // 2), (7, hy - 1, 5)]
    for mx, my, mz in cases:
        f = (axis_mode(X, Lx, mx, px) * axis_mode(Y, Ly, my, py)
             * np.cos(2 * np.pi * mz * Z / Lz))
        f = f - f.mean()
        p = ns.poisson(jnp.asarray(f))
        lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
        err = lap - f
        err -= err.mean()
        m = np.max(np.abs(err))
        assert m < 1e-10, f"mode ({mx},{my},{mz}): {m:.2e}"


@pytest.mark.parametrize("bcs_x,bcs_y", [
    (BC.PERIODIC, BC.PERIODIC),    # 000
    (BC.PERIODIC, BC.NEUMANN),     # 010
    (BC.NEUMANN, BC.PERIODIC),     # 100
    (BC.DIRICHLET, BC.DIRICHLET),  # 110
])
def test_fft_pipeline_multimode(bcs_x, bcs_y):
    """The FFT Poisson pipeline must pass the same multi-mode roundtrip
    matrix as the matmul variant (both diagonalise the identical
    staggered operator; reference poisson_fft.f90:174-203)."""
    n = 32
    bcs = ((bcs_x, bcs_x), (bcs_y, bcs_y),
           (BC.PERIODIC, BC.PERIODIC))
    nv = (n if bcs_x == BC.PERIODIC else n + 1,
          n if bcs_y == BC.PERIODIC else n + 1, n)
    mesh = Mesh(global_vert_dims=nv, L=(2 * np.pi,) * 3, BCs=bcs)
    ns = NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64,
                            poisson_method="fft")
    X, Y, Z = cell_grids(mesh)
    Lx, Ly, Lz = mesh.L
    px = bcs_x == BC.PERIODIC
    py = bcs_y == BC.PERIODIC
    hx = n // 2 if px else n - 1
    hy = n // 2 if py else n - 1
    for mx, my, mz in [(1, 1, 1), (2, 1, 3), (1, 4, 2), (5, 3, 7),
                       (hx, 1, 2), (1, hy, 1), (2, 3, n // 2),
                       (7, hy - 1, 5)]:
        f = ((np.cos(2 * np.pi * mx * X / Lx) if px
              else np.cos(np.pi * mx * X / Lx))
             * (np.cos(2 * np.pi * my * Y / Ly) if py
                else np.cos(np.pi * my * Y / Ly))
             * np.cos(2 * np.pi * mz * Z / Lz))
        f = f - f.mean()
        p = ns.poisson(jnp.asarray(f))
        lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
        err = lap - f
        err -= err.mean()
        m = np.max(np.abs(err))
        assert m < 1e-10, f"mode ({mx},{my},{mz}): {m:.2e}"


@pytest.mark.parametrize("bcs_x,bcs_y", [
    (BC.PERIODIC, BC.PERIODIC),    # 000
    (BC.PERIODIC, BC.NEUMANN),     # 010
    (BC.PERIODIC, BC.DIRICHLET),   # 010 (midpoint ops forced to Neumann)
    (BC.NEUMANN, BC.PERIODIC),     # 100
    (BC.DIRICHLET, BC.PERIODIC),   # 100
    (BC.NEUMANN, BC.NEUMANN),      # 110
    (BC.DIRICHLET, BC.DIRICHLET),  # 110
])
def test_poisson_roundtrip_div_grad(bcs_x, bcs_y):
    """div(grad(p)) after the solve must reproduce the input divergence
    field to near machine precision (exact spectral equivalence). Covers
    the reference's test_poisson_bc BC matrix (000/010/100/110)."""
    n = 32
    bcs = ((bcs_x, bcs_x), (bcs_y, bcs_y),
           (BC.PERIODIC, BC.PERIODIC))
    nv = (n if bcs_x == BC.PERIODIC else n + 1,
          n if bcs_y == BC.PERIODIC else n + 1, n)
    L = (2 * np.pi,) * 3
    mesh, ns = make_solver(nv, bcs, L)
    X, Y, Z = cell_grids(mesh)
    Lx, Ly = mesh.L[0], mesh.L[1]
    # RHS built from cosines compatible with Neumann pressure BCs
    f = (np.cos(2 * np.pi * X / Lx) * np.cos(2 * np.pi * Y / Ly) * np.cos(Z)
         + 0.3 * np.cos(4 * np.pi * X / Lx) * np.cos(4 * np.pi * Y / Ly))
    f = f - f.mean()
    p = ns.poisson(jnp.asarray(f))
    # laplacian on the pressure (cell) grid via staggered grad then div
    dpdx, dpdy, dpdz = ns.gradient_p2v(p)
    lap = ns.divergence_v2p(dpdx, dpdy, dpdz)
    err = np.asarray(lap) - f
    err -= err.mean()
    assert np.max(np.abs(err)) < 1e-10, np.max(np.abs(err))
