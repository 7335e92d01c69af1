"""FFT-based spectral Poisson solver for the pressure projection.

Re-design of the reference's poisson_fft layer for XLA:
  - /root/reference/src/poisson_fft.f90 (waves_set:654-831, wave_numbers:833-882,
    BC dispatch base_init:120-204)
  - /root/reference/src/backend/omp/kernels/spectral_processing.f90
    (process_spectral_000:7-106, process_spectral_010:108-283)
  - DCT-via-FFT folding: omp/poisson_fft.f90:237-285

Instead of cuFFTMp/2DECOMP pencil machinery, we use jnp.fft under jit: XLA
shards FFTs over the device mesh with ICI all-to-alls automatically. The
spectral post-processing (staggered-grid phase shifts, modified-wavenumber
division) is pure elementwise arithmetic that XLA fuses into the FFT
pipeline.

The modified wavenumber ("spectral equivalence") tables make the FFT
inverse *exactly* consistent with the compact-scheme divergence and
gradient operators (Laizet & Lamballais JCP 228 (2009), Sec 4): the solve
uses the transfer functions of stagder_v2p and interpl_v2p, so
div(grad(p)) computed by the compact operators reproduces the input
divergence to scheme accuracy.

Supported BC variants (periodicity of x,y,z): 000 (fully periodic) and
010 (non-periodic y) including the even-extension folding; 100/110 follow
the same machinery (see variant table in __init__).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..common import BC
from ..mesh import Mesh
from .dirops import AxisOps

_EPS = 1e-16


def wave_numbers(n, L, d, periodic, c_a, c_b, c_alpha):
    """Modified wavenumber tables for one axis (poisson_fft.f90:833-882).

    Returns (a, b, k, e, k2) real float64 arrays of length n. The reference
    stores k/e/k2 as complex with equal real and imaginary parts; only the
    (equal) magnitude matters for the uniform-mesh solve, so we keep reals.
    """
    i = np.arange(n, dtype=np.float64)
    if periodic:
        a = np.sin(i * np.pi / n)
        b = np.cos(i * np.pi / n)
        w = 2 * np.pi * i / n
    else:
        a = np.sin(i * np.pi / 2 / n)
        b = np.cos(i * np.pi / 2 / n)
        w = np.pi * i / n
    wp = c_a * 2 * d * np.sin(0.5 * w) + c_b * 2 * d * np.sin(1.5 * w)
    wp = wp / (1.0 + 2 * c_alpha * np.cos(w))
    k = n * wp / L
    e = n * w / L
    k2 = (n * wp / L) ** 2
    if periodic:
        # mirror the upper half onto the conjugate modes
        # (poisson_fft.f90:865-869)
        for arr in (k, e, k2):
            arr[n // 2 + 1:] = arr[1:n - n // 2][::-1]
        w_e = e  # e mirrored as well
    return a, b, k, e, k2


def _interp_transfer(op, e, d):
    """Midpoint-interpolation transfer function T(w) = tt/t1 evaluated at
    e*d (waves_set, poisson_fft.f90:706-721)."""
    w = e * d
    tt = 2 * (op.a * np.cos(w * 0.5) + op.b * np.cos(w * 1.5)
              + op.c * np.cos(w * 2.5) + op.d * np.cos(w * 3.5))
    t1 = 1.0 + 2 * op.alpha * np.cos(w)
    return tt / t1


def fold_even(f, axis):
    """Even-extension reordering: prepare a non-periodic axis for a
    periodic FFT (enforce_periodicity_y, omp/poisson_fft.f90:237-261)."""
    ev = jax.lax.slice_in_dim(f, 0, f.shape[axis], 2, axis)
    od = jax.lax.slice_in_dim(f, 1, f.shape[axis], 2, axis)
    return jnp.concatenate([ev, jnp.flip(od, axis)], axis=axis)


def unfold_even(f, axis):
    """Inverse of fold_even (undo_periodicity_y, omp/poisson_fft.f90:263-285)."""
    n = f.shape[axis]
    half1 = jax.lax.slice_in_dim(f, 0, n // 2, 1, axis)
    half2 = jnp.flip(jax.lax.slice_in_dim(f, n // 2, n, 1, axis), axis)
    # interleave: out[2j] = half1[j], out[2j+1] = half2[j]
    stacked = jnp.stack([half1, half2], axis=axis + 1)
    shape = list(f.shape)
    return stacked.reshape(shape)


class SpectralPoisson:
    """Pressure Poisson solve on the cell grid for BC variants 000/010."""

    def __init__(self, mesh: Mesh, ops: tuple[AxisOps, AxisOps, AxisOps],
                 dtype=jnp.float32):
        self.mesh = mesh
        per = mesh.periodic
        if per == (True, True, True):
            self.variant = "000"
        elif per == (True, False, True):
            self.variant = "010"
        elif per == (False, True, True):
            self.variant = "100"
        elif per == (False, False, True):
            self.variant = "110"
        else:
            raise ValueError(f"unsupported Poisson BC combination {per}")
        if self.variant in ("100", "110"):
            raise NotImplementedError(
                f"Poisson variant {self.variant} not yet implemented")
        if any(mesh.stretched[a] for a in (0, 2)):
            raise ValueError("FFT Poisson does not support x/z stretching")
        if mesh.stretched[1]:
            raise NotImplementedError(
                "stretched-y spectral operator not yet implemented")

        nx, ny, nz = mesh.global_cell_dims
        self.nc = (nx, ny, nz)
        d = mesh.d
        self.rdtype = dtype
        self.cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128

        tabs = []
        for ax, axops in enumerate(ops):
            st = axops.stagder_v2p
            tabs.append(wave_numbers(self.nc[ax], mesh.L[ax], d[ax],
                                     per[ax], st.a, st.b, st.alpha))
        (self.ax_, self.bx_, kx, ex, k2x) = tabs[0]
        (self.ay_, self.by_, ky, ey, k2y) = tabs[1]
        (self.az_, self.bz_, kz, ez, k2z) = tabs[2]

        # transfer functions of interpl_v2p per axis (waves_set)
        Tx = _interp_transfer(ops[0].interpl_v2p, ex, d[0])
        Ty = _interp_transfer(ops[1].interpl_v2p, ey, d[1])
        Tz = _interp_transfer(ops[2].interpl_v2p, ez, d[2])

        # spectral array layout: (nx//2+1, ny, nz) -- rfft along x
        nxs = nx // 2 + 1
        sl = np.s_[:nxs]
        waves = (
            k2x[sl, None, None] * (Ty[None, :, None] * Tz[None, None, :]) ** 2
            + k2y[None, :, None] * (Tx[sl, None, None] * Tz[None, None, :]) ** 2
            + k2z[None, None, :] * (Tx[sl, None, None] * Ty[None, :, None]) ** 2
        )
        self.waves = jnp.asarray(waves, dtype=jnp.float64 if dtype == jnp.float64
                                 else jnp.float32)

        # phase-shift tables restricted to the spectral ranges, as (broadcast)
        # arrays; flip signs where global index exceeds n/2+1 (1-based)
        i = np.arange(nxs)
        j = np.arange(ny)
        k = np.arange(nz)
        f64 = np.float64
        self.sx = np.ones(nxs)  # r2c axis: flip never triggers
        self.sy = np.where(j > ny // 2, -1.0, 1.0)
        self.sz = np.where(k > nz // 2, -1.0, 1.0)

        def dev(x, shape):
            return jnp.asarray(np.asarray(x, f64).reshape(shape), dtype=dtype)

        self.AX = dev(self.ax_[:nxs], (nxs, 1, 1))
        self.BX = dev(self.bx_[:nxs], (nxs, 1, 1))
        self.AY = dev(self.ay_, (1, ny, 1))
        self.BY = dev(self.by_, (1, ny, 1))
        self.AZ = dev(self.az_, (1, 1, nz))
        self.BZ = dev(self.bz_, (1, 1, nz))
        self.SY = dev(self.sy, (1, ny, 1))
        self.SZ = dev(self.sz, (1, 1, nz))

        if self.variant == "010":
            # y-axis is folded; recombination uses ay/by at paired indices.
            # Mask for the post-solve zeroing at (nyquist x, nyquist z)
            # (process_spectral_010:216)
            zero_mask = np.ones((nxs, 1, nz))
            if nx % 2 == 0 and nz % 2 == 0:
                zero_mask[nx // 2, 0, nz // 2] = 0.0
            self.zero_mask = jnp.asarray(zero_mask, dtype=dtype)

    # -- spectral shift helpers (literal ports of process_spectral_000) ----
    def _fwd_z(self, dr, dc):
        r = (dr * self.BZ + dc * self.AZ) * self.SZ
        c = (dc * self.BZ - dr * self.AZ) * self.SZ
        return r, c

    def _fwd_y(self, dr, dc):
        r = (dr * self.BY + dc * self.AY) * self.SY
        c = (dc * self.BY - dr * self.AY) * self.SY
        return r, c

    def _fwd_x(self, dr, dc):
        r = dr * self.BX + dc * self.AX
        c = dc * self.BX - dr * self.AX
        return r, c

    def _bwd_z(self, dr, dc):
        r = (dr * self.BZ - dc * self.AZ) * self.SZ
        c = (-dc * self.BZ - dr * self.AZ) * self.SZ
        return r, c

    def _bwd_y(self, dr, dc):
        r = (dr * self.BY + dc * self.AY) * self.SY
        c = (dc * self.BY - dr * self.AY) * self.SY
        return r, c

    def _bwd_x(self, dr, dc):
        r = dr * self.BX + dc * self.AX
        c = -dc * self.BX + dr * self.AX
        return r, c

    def _fwd_z_010(self, dr, dc):
        return self._fwd_z(dr, dc)

    def _bwd_z_010(self, dr, dc):
        # process_spectral_010:260-266 (note sign pattern differs from 000)
        r = (dr * self.BZ - dc * self.AZ) * self.SZ
        c = (dc * self.BZ + dr * self.AZ) * self.SZ
        return r, c

    def _fwd_x_010(self, dr, dc):
        # with flips (no-op for r2c x, kept for parity)
        r = dr * self.BX + dc * self.AX
        c = dc * self.BX - dr * self.AX
        return r, c

    def _bwd_x_010(self, dr, dc):
        r = dr * self.BX - dc * self.AX
        c = dc * self.BX + dr * self.AX
        return r, c

    def _recombine_y_fwd(self, dr, dc):
        """Pair-recombination of the folded y axis
        (process_spectral_010:166-191)."""
        ny = self.nc[1]
        rev = lambda t: jnp.flip(t[:, 1:, :], axis=1)  # index ny-j (0-based pairing)
        l_r, l_c = dr[:, 1:, :], dc[:, 1:, :]
        r_r, r_c = rev(dr), rev(dc)
        ay = self.AY[:, 1:, :]
        by = self.BY[:, 1:, :]
        new_r = 0.5 * (l_r * by + l_c * ay + r_r * by - r_c * ay)
        new_c = 0.5 * (-l_r * ay + l_c * by + r_r * ay + r_c * by)
        dr = jnp.concatenate([dr[:, :1, :], new_r], axis=1)
        dc = jnp.concatenate([dc[:, :1, :], new_c], axis=1)
        return dr, dc

    def _recombine_y_bwd(self, dr, dc):
        """Inverse pair-recombination (process_spectral_010:223-248)."""
        rev = lambda t: jnp.flip(t[:, 1:, :], axis=1)
        l_r, l_c = dr[:, 1:, :], dc[:, 1:, :]
        r_r, r_c = rev(dr), rev(dc)
        ay = self.AY[:, 1:, :]
        by = self.BY[:, 1:, :]
        new_r = l_r * by - l_c * ay + r_r * ay + r_c * by
        new_c = l_r * ay + l_c * by - r_r * by + r_c * ay
        dr = jnp.concatenate([dr[:, :1, :], new_r], axis=1)
        dc = jnp.concatenate([dc[:, :1, :], new_c], axis=1)
        return dr, dc

    def __call__(self, f: jax.Array) -> jax.Array:
        """Solve lap(p) = f on the cell grid; returns p (mean-free)."""
        nx, ny, nz = self.nc
        if self.variant == "010":
            f = fold_even(f, axis=1)

        F = jnp.fft.fftn(jnp.fft.rfft(f, axis=0), axes=(1, 2))
        dr = jnp.real(F).astype(self.rdtype)
        dc = jnp.imag(F).astype(self.rdtype)
        # NOTE: the reference normalises by 1/(nx*ny*nz) here because its
        # FFTs are unnormalised in both directions; jnp.ifft applies 1/N,
        # so no explicit normalisation is needed.

        if self.variant == "000":
            dr, dc = self._fwd_z(dr, dc)
            dr, dc = self._fwd_y(dr, dc)
            dr, dc = self._fwd_x(dr, dc)
            w = self.waves
            ok = w >= _EPS
            dr = jnp.where(ok, -dr / jnp.where(ok, w, 1.0), 0.0)
            dc = jnp.where(ok, -dc / jnp.where(ok, w, 1.0), 0.0)
            dr, dc = self._bwd_z(dr, dc)
            dr, dc = self._bwd_y(dr, dc)
            dr, dc = self._bwd_x(dr, dc)
        else:  # 010
            dr, dc = self._fwd_z_010(dr, dc)
            dr, dc = self._fwd_x_010(dr, dc)
            dr, dc = self._recombine_y_fwd(dr, dc)
            w = self.waves
            ok = jnp.abs(w) >= _EPS
            dr = jnp.where(ok, -dr / jnp.where(ok, w, 1.0), 0.0)
            dc = jnp.where(ok, -dc / jnp.where(ok, w, 1.0), 0.0)
            dr = dr * self.zero_mask
            dc = dc * self.zero_mask
            dr, dc = self._recombine_y_bwd(dr, dc)
            dr, dc = self._bwd_x_010(dr, dc)
            dr, dc = self._bwd_z_010(dr, dc)

        F = (dr + 1j * dc).astype(self.cdtype)
        p = jnp.fft.irfft(jnp.fft.ifftn(F, axes=(1, 2)), n=nx, axis=0)
        p = p.astype(self.rdtype)
        if self.variant == "010":
            p = unfold_even(p, axis=1)
        return p
