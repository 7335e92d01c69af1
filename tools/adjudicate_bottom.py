#!/usr/bin/env python
"""Adjudicate the 'bottom' y-stretching spectral Poisson path.

The reference builds, per (kx, kz) mode, a pentadiagonal spectral system
A for the stretched-y pressure solve (/root/reference/src/poisson_fft.f90
stretching_matrix:320-422 for 'bottom'; :424-650 for the parity-split
'centred'/'top-bottom'). For the solve to satisfy the discrete roundtrip
div(grad(solve(f))) = f, A must equal the TRUE spectral operator

    D = Forward . divgrad . Backward        (per (kx, kz) block)

where divgrad is the discrete staggered divergence-of-gradient and
Forward/Backward are the separable transforms of the matmul path. This
tool measures both sides numerically in float64:

  1. calibrates on 'centred' and 'top-bottom' (these pass the roundtrip
     at 1e-10, so A ~= D there by construction),
  2. probes 'bottom' the same way and reports where A and D disagree.

Usage: python tools/adjudicate_bottom.py [ny_cells]
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

os.environ["X3D2_PALLAS"] = "0"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes
from x3d2_tpu.ops.matmul_poisson import MatmulPoisson
from x3d2_tpu.ops.stretched_poisson import build_stretch_matrices
from x3d2_tpu.ops.fft_poisson import wave_numbers, _interp_transfer

NY = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NX = NZ = 16
BETA = 0.259065151


def make(stretching):
    mesh = Mesh((NX, NY + 1, NZ), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", stretching, "uniform"),
                beta=(1.0, BETA, 1.0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ns = NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64)
    po = MatmulPoisson(mesh, ns.ops, dtype=jnp.float64, unsafe_bottom=True)
    return mesh, ns, po


def probe_D(mesh, ns, po):
    """D[ix, iz] = ny x ny block of Forward . divgrad . Backward."""
    nx, ny, nz = po.nc

    def fwd(f):
        from x3d2_tpu.ops.compact import apply_matrix
        for a in range(3):
            f = apply_matrix(po.Tf[a], f, a)
        return f

    def bwd(F):
        from x3d2_tpu.ops.compact import apply_matrix
        for a in range(3):
            F = apply_matrix(po.Ti[a], F, a)
        return F

    @jax.jit
    def column(F):
        p = bwd(F)
        lap = ns.divergence_v2p(*ns.gradient_p2v(p))
        return fwd(lap)

    D = np.zeros((nx, nz, ny, ny))
    for j in range(ny):
        F = jnp.zeros((nx, ny, nz), jnp.float64).at[:, j, :].set(1.0)
        G = np.asarray(column(F))
        D[:, :, :, j] = np.moveaxis(G, 1, 2)

    # block-diagonality check: a single-mode probe must not leak to
    # other (ix, iz) positions
    F = jnp.zeros((nx, ny, nz), jnp.float64).at[3, 5, 7].set(1.0)
    G = np.asarray(column(F))
    leak = np.abs(G).sum() - np.abs(G[3, :, 7]).sum()
    total = np.abs(G).sum()
    return D, leak / max(total, 1e-300)


def assemble_A(mesh, po):
    """The reference pentadiagonal assembly, as dense ny x ny blocks."""
    nx, ny, nz = po.nc
    per = mesh.periodic
    tabs, T = [], []
    for ax in range(3):
        st = po_ops[ax].stagder_v2p
        tabs.append(wave_numbers(po.nc[ax], mesh.L[ax], mesh.d[ax],
                                 per[ax], st.a, st.b, st.alpha))
        T.append(_interp_transfer(po_ops[ax].interpl_v2p, tabs[ax][2],
                                  mesh.d[ax]))
    k2 = [t[4] for t in tabs]
    k1 = [t[3] for t in tabs]
    g = mesh.geo[1]
    a_sets, offsets, inc = build_stretch_matrices(
        nx, ny, nz, T[0], T[1], T[2], k1[0], k1[1], k1[2],
        k2[0], k2[2], mesh.L[1], g.alpha, g.beta, g.stretching)

    A = np.zeros((nx, nz, ny, ny))
    for As, off in zip(a_sets, offsets):
        n = As.shape[1]
        for j in range(n):
            row = off + inc * j
            for b, shift in enumerate((-2, -1, 0, 1, 2)):
                col = row + inc * shift
                if 0 <= j + shift < n:
                    A[:, :, row, col] = As[:, j, :, b]
    return A


def compare(tag, A, D, skip_singular=True):
    """Per-(ix, iz) relative Frobenius difference, excluding the
    singular-mode tweak rows (A has identity rows there)."""
    nx, nz, ny, _ = A.shape
    worst, worst_ix = 0.0, None
    diffs = np.zeros((nx, nz))
    for ix in range(nx):
        for iz in range(nz):
            a, d = A[ix, iz].copy(), D[ix, iz].copy()
            if skip_singular:
                # identity-tweaked singular rows: compare structure only
                for r in range(ny):
                    if (abs(a[r, r] - 1.0) < 1e-14
                            and np.abs(a[r]).sum() < 1.0 + 1e-12):
                        a[r] = 0.0
                        d[r] = 0.0
            den = max(np.linalg.norm(d), 1e-300)
            rel = np.linalg.norm(a - d) / den
            diffs[ix, iz] = rel
            if rel > worst:
                worst, worst_ix = rel, (ix, iz)
    print(f"{tag:12s}: max rel ||A - D||_F = {worst:.3e} at (ix,iz)="
          f"{worst_ix}; median {np.median(diffs):.3e}")
    return worst, worst_ix


def band_profile(M, kmax=6):
    """Max |entry| per diagonal offset, relative to the overall max."""
    mx = np.abs(M).max()
    return {k: float(np.max(np.abs(np.diagonal(M, k))) / mx)
            for k in range(-kmax, kmax + 1)}


po_ops = None

for stretching in ("centred", "top-bottom", "bottom"):
    mesh, ns, po = make(stretching)
    po_ops = ns.ops
    D, leak = probe_D(mesh, ns, po)
    A = assemble_A(mesh, po)
    print(f"\n=== {stretching} (ny={po.nc[1]}) ===")
    print(f"block-diagonality leak: {leak:.2e}")
    # mask the Nyquist-Nyquist block: both sides are ~0 there (the
    # solve zeroes that mode), so relative diffs are noise/noise
    nyq = (po.nc[0] // 2, po.nc[2] // 2)
    Ac, Dc = A.copy(), D.copy()
    Ac[nyq[0], nyq[1]] = 0.0
    Dc[nyq[0], nyq[1]] = 0.0
    worst, wix = compare(stretching, Ac, Dc)
    if worst > 1e-8:
        ix, iz = (2, 3)
        a, d = A[ix, iz], D[ix, iz]
        print(f"  representative mode (ix,iz)=({ix},{iz}):")
        pa, pd = band_profile(a), band_profile(d)
        print(f"    {'diag':>6s} {'|A| rel':>10s} {'|D| rel':>10s} "
              f"{'max|A-D|/max|D|':>16s}")
        dmx = np.abs(d).max()
        for k in sorted(pa):
            dk = np.max(np.abs(np.diagonal(a - d, k))) / dmx
            print(f"    {k:6d} {pa[k]:10.3e} {pd[k]:10.3e} {dk:16.3e}")
        off_band = a - d
        for k in range(-2, 3):
            np.fill_diagonal(off_band[max(0, -k):, max(0, k):], 0.0)
        print(f"    off-penta |A-D| max: {np.abs(off_band).max() / dmx:.3e}"
              f"  (a nonzero value here means the TRUE operator is not "
              f"pentadiagonal)")
        # interior vs boundary rows
        df = np.abs(a - d) / dmx
        print(f"    per-row max diff: first rows "
              f"{[f'{df[r].max():.1e}' for r in range(4)]}, "
              f"interior max {df[4:-4].max():.1e}, last rows "
              f"{[f'{df[r].max():.1e}' for r in range(-4, 0)]}")
