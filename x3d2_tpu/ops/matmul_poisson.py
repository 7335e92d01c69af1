"""Spectral Poisson solve as separable real matmul transforms.

TPU-native alternative to the FFT pipeline (fft_poisson.py): the discrete
pressure operator div(grad(.)) built from the compact staggered schemes is
diagonalised by a SEPARABLE real basis -- full real-DFT (cos/sin,
halfcomplex packing) on periodic axes and shifted-cosine DCT on
non-periodic (Neumann-pressure) axes -- with eigenvalues given by the
reference's modified-wavenumber tables (poisson_fft.f90 waves_set:654-831).
The solve is therefore

    p = T_x^-1 T_y^-1 T_z^-1 [ -T_z T_y T_x f / waves ]

i.e. six n*n real matmuls (MXU) plus one elementwise division, replacing
rfft/fft pipelines, even-extension folds and phase-shift postprocessing
entirely. Transform matrices and their exact inverses are built once in
float64. Equivalence with the FFT path is enforced by tests
(tests/test_poisson.py runs both).

Advantages on TPU: matmuls run on the MXU (FFTs do not), the whole solve
fuses into the step program, and sharded-axis contractions lower to clean
reduce-scatter collectives (no FFT all-to-alls; also avoids the XLA:CPU
sharded-FFT layout bug).

The stretched-y pentadiagonal solve (stretched_poisson.py) slots between
the transforms, operating on the single packed-real array (vs the FFT
path's separate re/im solves).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..common import BC
from ..mesh import Mesh
from .compact import apply_matrix
from .fft_poisson import wave_numbers, _interp_transfer

_EPS = 1e-16


def real_dft_matrix(n: int) -> np.ndarray:
    """Real DFT with halfcomplex packing: rows 0..n/2 are cos(2*pi*k*j/n),
    rows n/2+1..n-1 are sin(2*pi*k*j/n) for k = n-m (so row m pairs with
    the mirrored k2 tables)."""
    j = np.arange(n)
    T = np.zeros((n, n))
    for m in range(n // 2 + 1):
        T[m] = np.cos(2 * np.pi * m * j / n)
    for m in range(n // 2 + 1, n):
        k = n - m
        T[m] = np.sin(2 * np.pi * k * j / n)
    return T


def dct_matrix(n: int) -> np.ndarray:
    """Shifted-cosine basis for Neumann-pressure axes (cell-centred):
    rows cos(pi*k*(j+1/2)/n) -- the eigenbasis the reference reaches via
    even-extension folding + paired recombination."""
    j = np.arange(n) + 0.5
    return np.cos(np.pi * np.arange(n)[:, None] * j[None, :] / n)


class MatmulPoisson:
    """Pressure Poisson solve on the cell grid via separable real
    transforms; supports BC variants 000/010/100/110 and stretched y."""

    def __init__(self, mesh: Mesh, ops, dtype=jnp.float32):
        self.mesh = mesh
        per = mesh.periodic
        variants = {(True, True, True): "000", (True, False, True): "010",
                    (False, True, True): "100", (False, False, True): "110"}
        if per not in variants:
            raise ValueError(
                f"unsupported Poisson BC combination {per} "
                "(reference poisson_fft.f90:174-203 supports 000/010/100/110)")
        self.variant = variants[per]
        if any(mesh.stretched[a] for a in (0, 2)):
            raise ValueError("FFT Poisson does not support x/z stretching")
        self.stretched_y = mesh.stretched[1]
        if self.stretched_y and self.variant != "010":
            raise ValueError("stretched y requires the 010 BC combination")

        nx, ny, nz = mesh.global_cell_dims
        self.nc = (nx, ny, nz)
        self.rdtype = dtype
        self.folded = tuple(a for a in range(3) if not per[a])

        # modified-wavenumber tables (full length per axis)
        tabs, T = [], []
        for ax, axops in enumerate(ops):
            st = axops.stagder_v2p
            tabs.append(wave_numbers(self.nc[ax], mesh.L[ax], mesh.d[ax],
                                     per[ax], st.a, st.b, st.alpha))
            T.append(_interp_transfer(ops[ax].interpl_v2p, tabs[ax][2],
                                      mesh.d[ax]))
        k2 = [t[4] for t in tabs]
        k1 = [t[3] for t in tabs]

        # f64 1-D masters, consumed by the Pallas slab kernel
        # (ops/pallas_poisson.py) to rebuild the solve diagonal in-kernel
        self.k2_1d = [np.asarray(k2[a], np.float64) for a in range(3)]
        self.T_1d = [np.asarray(T[a], np.float64) for a in range(3)]

        # Nyquist zero indices for folded variants
        # (process_spectral_010:216 analogue)
        self._zero_idx = None
        if self.folded:
            zero_axes = {"010": (0, 2), "100": (1, 2), "110": (0, 2)}[
                self.variant]
            if all(self.nc[a] % 2 == 0 for a in zero_axes):
                self._zero_idx = zero_axes

        # per-axis transforms + exact inverses (float64 setup; the f64
        # masters feed the transform-fused projection matrices)
        self.Tf64, self.Ti64 = [], []
        for a in range(3):
            M = dct_matrix(self.nc[a]) if a in self.folded \
                else real_dft_matrix(self.nc[a])
            self.Tf64.append(np.asarray(M, np.float64))
            self.Ti64.append(np.linalg.inv(self.Tf64[a]))

        # Separable solve-diagonal decomposition (shared with the Pallas
        # slab kernels): waves(ix, iy, iz) = k2x[ix]*A[iy,iz]
        # + Tx[ix]^2*B[iy,iz]. The uniform tables reproduce the reference
        # modified-wavenumber product exactly; the eigen-resolved
        # stretched-y solve (below) swaps in its own tables. Keeping only
        # 1-D/2-D tables as device constants avoids an n^3 embedded
        # program constant and its per-step HBM reads.
        self.tab_A = np.outer(T[1] ** 2, T[2] ** 2)
        self.tab_B = (np.outer(k2[1], T[2] ** 2)
                      + np.outer(T[1] ** 2, k2[2]))

        self.stretch_solver = None
        self.stretch_resolved = False
        if self.stretched_y:
            import os
            g = mesh.geo[1]
            from .stretched_poisson import (StretchedYSolver,
                                            build_stretch_matrices,
                                            eigen_resolve)
            if os.environ.get("X3D2_STRETCH_EIG", "1") != "0":
                try:
                    Fy, Iy, lam = eigen_resolve(
                        ny, T[1], k1[1], mesh.L[1], g.alpha, g.beta,
                        g.stretching)
                    # fold the eigenbasis change into the y transforms:
                    # every downstream consumer (fused projection
                    # matrices, slab kernels, physical-p reconstruction)
                    # composes Tf/Ti, so the stretched solve becomes
                    # structurally identical to the uniform one
                    self.Tf64[1] = Fy @ self.Tf64[1]
                    self.Ti64[1] = self.Ti64[1] @ Iy
                    self.tab_A = np.broadcast_to(
                        (T[2] ** 2)[None, :], (ny, nz)).copy()
                    self.tab_B = (np.broadcast_to(k2[2][None, :], (ny, nz))
                                  - np.outer(lam, T[2] ** 2))
                    self.stretch_resolved = True
                except ValueError:
                    pass
            if not self.stretch_resolved:
                a_sets, offsets, inc = build_stretch_matrices(
                    nx, ny, nz, T[0], T[1], T[2],
                    k1[0], k1[1], k1[2], k2[0], k2[2],
                    mesh.L[1], g.alpha, g.beta, g.stretching)
                self.stretch_solver = StretchedYSolver(
                    a_sets, a_sets, offsets, inc, dtype=dtype)

        # device transforms from the (possibly eigen-modified) masters
        self.Tf = [jnp.asarray(M, dtype=dtype) for M in self.Tf64]
        self.Ti = [jnp.asarray(M, dtype=dtype) for M in self.Ti64]

    def _inv_waves(self):
        """The solve diagonal -1/waves rebuilt on the fly from the
        separable tables (fused by XLA into the division; avoids an n^3
        program constant and its per-step HBM reads)."""
        wdt = jnp.float64 if self.rdtype == jnp.float64 else jnp.float32
        nx = self.nc[0]
        k2x = jnp.asarray(self.k2_1d[0], wdt).reshape(nx, 1, 1)
        tx2 = jnp.asarray(self.T_1d[0] ** 2, wdt).reshape(nx, 1, 1)
        A = jnp.asarray(self.tab_A, wdt)[None]
        B = jnp.asarray(self.tab_B, wdt)[None]
        waves = k2x * A + tx2 * B
        ok = jnp.abs(waves) >= _EPS
        inv = jnp.where(ok, -1.0 / jnp.where(ok, waves, 1.0), 0.0)
        if self._zero_idx is not None:
            # zero the (Nyquist, Nyquist) INTERSECTION line of the named
            # axes — the reference kernels zero exactly
            # `i == nx/2+1 .and. k == nz/2+1`
            # (omp/kernels/spectral_processing.f90:216), not the whole
            # Nyquist planes
            hit = jnp.ones((), inv.dtype)
            for a in self._zero_idx:
                shp = [1, 1, 1]
                shp[a] = self.nc[a]
                idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shp), a)
                hit = hit * jnp.where(idx == self.nc[a] // 2, 1.0, 0.0)
            inv = inv * (1.0 - hit)
        return inv.astype(self.rdtype)

    @property
    def inv_waves(self):
        return self._inv_waves()

    def __call__(self, f: jax.Array) -> jax.Array:
        F = f
        for a in range(3):
            F = apply_matrix(self.Tf[a], F, a)
        if self.stretch_solver is not None:
            F = self.stretch_solver.solve_packed(F, self.nc[0], self.nc[2])
        else:
            F = F * self._inv_waves()
        for a in range(3):
            F = apply_matrix(self.Ti[a], F, a)
        return F
