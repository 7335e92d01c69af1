"""Stretched-y spectral Poisson operator.

Port of the reference's hardest numerics: with y-stretching the spectral
pressure solve is not a pointwise division but a pentadiagonal solve in
the y-wavenumber index per (kx, kz) mode, with the matrices built from the
stretching metric (Laizet & Lamballais JCP 228 (2009) Sec 5):
  - matrix construction: /root/reference/src/poisson_fft.f90
    stretching_matrix:275-652 ('bottom' single system :320-422;
    'centred'/'top-bottom' decoupled odd/even systems :424-650)
  - solve: backend/cuda/kernels/spectral_processing.f90
    process_spectral_010_poisson:465-622 (guarded Gaussian elimination)

TPU re-design: the reference re-runs the elimination on device every solve
(restoring stored matrices each call). Here the solve-independent
factorisation (elimination multipliers l1/l2 + modified diagonals) is done
ONCE in float64 numpy at setup; the runtime solve is two lax.scan linear
recurrences (2-term forward, 2-term backward) vectorised over all
(kx, kz) modes.

On a uniform mesh all matrix inputs have equal real/imaginary parts in the
reference (complex built as (1+i)*real), so a single real coefficient set
serves both components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-16


def _guarded_div(num, den):
    return np.where(np.abs(den) > _EPS, num / np.where(np.abs(den) > _EPS,
                                                       den, 1.0), 0.0)


def build_stretch_matrices(nx_spec, ny, nz_spec, trans_x, trans_y, trans_z,
                           kx, ky, kz, k2x, k2z, L_y, geo_alpha, beta,
                           stretching):
    """Build the pentadiagonal spectral matrices (float64).

    Returns (a_sets, offsets, inc): list of (nx_spec, n, nz_spec, 5) arrays
    with their y-mode offsets; inc=2 for the odd/even decoupled symmetric
    stretchings, 1 for 'bottom'. Diagonal order: (sub2, sub1, diag, sup1,
    sup2) as in the reference kernels.
    """
    def km(ix, iy, iz):
        """Modified-wavenumber product (poisson_fft.f90 get_km:902-911).
        iy is a 0-based index that may exceed ny-1 for never-used entries;
        clip for safety."""
        iyc = min(max(iy, 0), ny - 1)
        return trans_x[ix] * ky[iyc] * trans_z[iz]

    IX = np.arange(nx_spec)
    IZ = np.arange(nz_spec)
    TX = trans_x[:nx_spec]
    TZ = trans_z[:nz_spec]
    KX = kx[:nx_spec]
    KZ = kz[:nz_spec]

    def xz_term(iy):
        """-(kx*Ty*Tz)^2 - (kz*Ty*Tx)^2 over the (ix, iz) grid."""
        ty = trans_y[min(iy, ny - 1)]
        return (-(KX[:, None] * ty * TZ[None, :]) ** 2
                - (KZ[None, :] * ty * TX[:, None]) ** 2)

    def km_grid(iy):
        iyc = min(max(iy, 0), ny - 1)
        return TX[:, None] * ky[iyc] * TZ[None, :]

    a0 = (geo_alpha / np.pi + 1.0 / (2 * np.pi * beta)) * L_y

    if stretching == "bottom":
        a1 = -1.0 / (4 * np.pi * beta) * L_y
        n = ny
        A = np.zeros((nx_spec, n, nz_spec, 5))
        for j in range(n):  # 0-based y mode
            iy = j
            # diagonal (poisson_fft.f90:329-357)
            if iy == 0:
                km_a1 = km_grid(1)
            elif iy == n - 1:
                km_a1 = km_grid(n - 2)
            else:
                km_a1 = km_grid(iy - 1) + km_grid(iy + 1)
            A[:, j, :, 2] = (xz_term(iy)
                             - a0**2 * km_grid(iy) ** 2
                             - a1**2 * km_grid(iy) * km_a1)
            # diag+1 (:360-373)
            A[:, j, :, 3] = (a0 * a1 * km_grid(iy + 1)
                             * (km_grid(iy) + km_grid(iy + 1)))
            # diag+2 (:376-387), rows 0..n-3
            if j <= n - 3:
                A[:, j, :, 4] = -a1 * a1 * km_grid(iy + 1) * km_grid(iy + 2)
            # diag-1 (:389-403), rows 1..
            if j >= 1:
                A[:, j, :, 1] = (a0 * a1 * km_grid(iy - 1)
                                 * (km_grid(iy) + km_grid(iy - 1)))
            # diag-2 (:405-417), rows 2..
            if j >= 2:
                A[:, j, :, 0] = -a1 * a1 * km_grid(iy - 1) * km_grid(iy - 2)
        # DEVIATION from the reference (upstream bug, adjudicated in
        # tools/adjudicate_bottom.py): the first row's +1/+2 couplings
        # must include the aliased k=-1/k=-2 metric contributions (mode
        # -k == mode +k in the cosine basis), i.e. exactly 2x the
        # one-sided terms of poisson_fft.f90:360-387. The parity-split
        # branches carry these factors (c1_od = 2*a0*a1 at j1==1,
        # :506-510); the 'bottom' branch upstream does not, which makes
        # its operator differ from the discrete div(grad) by exactly a
        # factor 1/2 in A[0,1], A[0,2] (measured; all other entries
        # match at 1e-15).
        A[:, 0, :, 3] *= 2.0
        A[:, 0, :, 4] *= 2.0
        # singular-mode tweak (:419-422): global first mode only
        A[0, 0, 0, 2] = 1.0
        A[0, 0, 0, 3] = 0.0
        A[0, 0, 0, 4] = 0.0
        return [A], [0], 1

    # symmetric stretchings: decoupled odd/even systems (:424-650)
    if stretching == "centred":
        a1 = 1.0 / (4 * np.pi * beta) * L_y
    elif stretching == "top-bottom":
        a1 = -1.0 / (4 * np.pi * beta) * L_y
    else:
        raise ValueError(f"unknown stretching {stretching!r}")
    nh = ny // 2
    A_od = np.zeros((nx_spec, nh, nz_spec, 5))
    A_ev = np.zeros((nx_spec, nh, nz_spec, 5))
    for j in range(nh):  # 0-based within the parity set
        j1 = j + 1  # reference 1-based loop index
        iy_od = 2 * j1 - 1 - 1  # 0-based odd-set spectral index (0,2,4..)
        iy_ev = 2 * j1 - 1  # 0-based even-set index (1,3,5..)
        # --- diagonal (:446-501)
        c1_od = a0 * a0
        c2_od = a1 * a1
        c1_ev = a0 * a0
        c2_ev = a1 * a1
        if j1 == 1:
            c1_ev = a0 * a0 - a1 * a1
            km_a1_od = km_grid(2)
            km_a1_ev = km_grid(3)
        elif j1 == nh:
            c1_ev = (a0 + a1) ** 2
            km_a1_od = km_grid(iy_od - 2)
            km_a1_ev = km_grid(iy_ev - 2)
        else:
            km_a1_od = km_grid(iy_od - 2) + km_grid(iy_od + 2)
            km_a1_ev = km_grid(iy_ev - 2) + km_grid(iy_ev + 2)
        A_od[:, j, :, 2] = (xz_term(iy_od)
                            - c1_od * km_grid(iy_od) ** 2
                            - c2_od * km_grid(iy_od) * km_a1_od)
        A_ev[:, j, :, 2] = (xz_term(iy_ev)
                            - c1_ev * km_grid(iy_ev) ** 2
                            - c2_ev * km_grid(iy_ev) * km_a1_ev)
        # --- diag+1 (:503-543)
        c1_od = c2_od = a0 * a1
        c1_ev = c2_ev = a0 * a1
        if j1 == 1:
            c1_od = 2 * a0 * a1
            c2_od = 2 * a0 * a1
            c1_ev = a0 * a1 - a1 * a1
            c2_ev = a0 * a1
        elif j1 == nh - 1:
            c1_ev = a0 * a1
            c2_ev = (a0 + a1) * a1
        elif j1 == nh:
            c1_ev = 0.0
            c2_ev = 0.0
        A_od[:, j, :, 3] = (c1_od * km_grid(iy_od) * km_grid(iy_od + 2)
                            + c2_od * km_grid(iy_od + 2) ** 2)
        A_ev[:, j, :, 3] = (c1_ev * km_grid(iy_ev) * km_grid(iy_ev + 2)
                            + c2_ev * km_grid(iy_ev + 2) ** 2)
        # --- diag+2 (:545-571), rows 0..nh-3
        if j1 <= nh - 2:
            c1_od = 2 * a1 * a1 if j1 == 1 else a1 * a1
            c1_ev = a1 * a1
            A_od[:, j, :, 4] = -(c1_od * km_grid(iy_od + 2)
                                 * km_grid(iy_od + 4))
            A_ev[:, j, :, 4] = -(c1_ev * km_grid(iy_ev + 2)
                                 * km_grid(iy_ev + 4))
        # --- diag-1 (:573-611), rows j1 >= 2
        if j1 >= 2:
            c1_od = c2_od = a0 * a1
            c1_ev = c2_ev = a0 * a1
            if j1 == 2:
                c1_ev = a0 * a1
                c2_ev = (a0 + a1) * a1
            elif j1 == nh:
                c1_ev = (a0 + a1) * a1
                c2_ev = a0 * a1
            A_od[:, j, :, 1] = (c1_od * km_grid(iy_od) * km_grid(iy_od - 2)
                                + c2_od * km_grid(iy_od - 2) ** 2)
            A_ev[:, j, :, 1] = (c1_ev * km_grid(iy_ev) * km_grid(iy_ev - 2)
                                + c2_ev * km_grid(iy_ev - 2) ** 2)
        # --- diag-2 (:613-634), rows j1 >= 3
        if j1 >= 3:
            A_od[:, j, :, 0] = -(a1 * a1 * km_grid(iy_od - 2)
                                 * km_grid(iy_od - 4))
            A_ev[:, j, :, 0] = -(a1 * a1 * km_grid(iy_ev - 2)
                                 * km_grid(iy_ev - 4))
    # singular-mode tweak (:636-649): modes with k2x,k2z ~ 0
    sing = (k2x[:nx_spec, None] < 1e-15) & (k2z[None, :nz_spec] < 1e-15)
    ix, iz = np.nonzero(sing)
    A_od[ix, 0, iz, 2] = 1.0
    A_od[ix, 0, iz, 3] = 0.0
    A_od[ix, 0, iz, 4] = 0.0
    return [A_od, A_ev], [0, 1], 2


def _banded5_to_dense(A5):
    """(n, 5) diagonal-order (sub2, sub1, diag, sup1, sup2) -> (n, n)."""
    n = A5.shape[0]
    D = np.zeros((n, n))
    for k, off in enumerate((-2, -1, 0, 1, 2)):
        for j in range(n):
            c = j + off
            if 0 <= c < n:
                D[j, c] = A5[j, k]
    return D


def extract_pencils(ny, trans_y, ky, L_y, geo_alpha, beta, stretching):
    """Extract the two-parameter family structure of the spectral
    matrices: every A(kx, kz) built by build_stretch_matrices is

        A = w * D + s^2 * B,   w = -((kx Tz)^2 + (kz Tx)^2),  s = Tx Tz,

    because each entry is a product of exactly two modified wavenumbers
    km = Tx*ky*Tz (the s^2 part) except the xz_term diagonal (the w part,
    with D = diag(Ty(iy)^2)). D and B are recovered by two probe builds
    (w=0,s=1 and w=-D-scale,s=1) at a non-singular probe mode so the
    singular-mode row tweaks cannot pollute them.

    Returns (sets, offsets, inc) with sets = [(d_vec, B_dense), ...]
    per parity set, all float64.
    """
    ones2 = np.ones(2)
    zeros2 = np.zeros(2)
    # probe 1: kx=kz=0 -> w=0; Tx=Tz=1 -> s=1; A = B.  k2x=k2z=1 keeps
    # every mode clear of the singular-mode test.
    sets_B, offsets, inc = build_stretch_matrices(
        2, ny, 2, ones2, trans_y, ones2, zeros2, ky, zeros2, ones2, ones2,
        L_y, geo_alpha, beta, stretching)
    # probe 2: kx=1, kz=0, Tx=Tz=1 -> w-part evaluates at -Ty(iy)^2,
    # i.e. A2 = -D + B, so D = B - A2.
    sets_A2, _, _ = build_stretch_matrices(
        2, ny, 2, ones2, trans_y, ones2, ones2, ky, zeros2, ones2, ones2,
        L_y, geo_alpha, beta, stretching)
    sets = []
    for B5, A25 in zip(sets_B, sets_A2):
        B5 = B5[1, :, 1, :]
        A25 = A25[1, :, 1, :]
        D5 = B5 - A25
        off_mass = np.abs(np.delete(D5, 2, axis=1)).max()
        scale = max(np.abs(B5).max(), 1.0)
        if off_mass > 1e-12 * scale:
            raise ValueError("w-dependence is not purely diagonal")
        sets.append((D5[:, 2].copy(), _banded5_to_dense(B5)))
    return sets, offsets, inc


def eigen_resolve(ny, trans_y, ky, L_y, geo_alpha, beta, stretching,
                  tol=1e-8):
    """Resolve the stretched-y pentadiagonal solve into a fixed pair of
    dense y-matrices plus a separable diagonal division.

    With A = w*D + s^2*B (see extract_pencils) and the real
    eigendecomposition D^{-1} B = V diag(lam) V^{-1}, the per-mode solve
    x = A^{-1} r becomes

        x = Iy @ [ (Fy @ r) / (w + s^2 * lam) ],
        Fy = V^{-1} D^{-1},  Iy = V         (parity-embedded, ny x ny)

    which is the SAME structure as the uniform spectral solve: two extra
    y-basis matrices (foldable into the existing transform-fused
    projection matrices) and a modified-wavenumber-style separable
    denominator. Singular modes (w=0 and lam=0 — the pressure gauge
    mode) fall to the standard |waves|<eps guard; the eliminated-solve
    path pins that mode to r0 instead, a pure gauge constant (the A
    column coupling x0 into other rows is exactly zero there).

    Returns (Fy, Iy, lam) float64, or raises ValueError when the pencil
    is not cleanly diagonalizable (caller falls back to the scan path).
    """
    sets, offsets, inc = extract_pencils(ny, trans_y, ky, L_y, geo_alpha,
                                         beta, stretching)
    Fy = np.zeros((ny, ny))
    Iy = np.zeros((ny, ny))
    lam = np.zeros(ny)
    for (d, B), off in zip(sets, offsets):
        n = d.shape[0]
        if np.abs(d).min() <= 0:
            raise ValueError("stretching metric diagonal not positive")
        M = B / d[:, None]
        ev, V = np.linalg.eig(M)
        scale = max(np.abs(ev.real).max(), 1.0)
        if np.abs(ev.imag).max() > 1e-9 * scale:
            raise ValueError("complex eigenvalues in stretched-y pencil")
        ev = ev.real
        V = V.real
        # snap the structural null eigenvalue (B's first column is
        # exactly zero at the gauge mode) to exact zero so the waves
        # guard catches it; genuine eigenvalues sit many orders above
        ev = np.where(np.abs(ev) < 1e-10 * scale, 0.0, ev)
        Q = np.linalg.solve(V, np.diag(1.0 / d))
        # diagonal balance: scale eigenvector columns so that
        # ||row_i(Q)|| == ||col_i(V)|| (diagonals commute past the
        # eigen-mode division, so this is exact); shrinks the dynamic
        # range the f32/bf16 matmuls see from D^-1's ~n^2 spread
        r_n = np.linalg.norm(Q, axis=1)
        c_n = np.linalg.norm(V, axis=0)
        sig = np.sqrt(c_n / np.maximum(r_n, 1e-300))
        Q = Q * sig[:, None]
        V = V / sig[None, :]
        # residual check at random non-singular shifts theta:
        # (theta*D + B) @ V diag(1/(theta+lam)) Q must be the identity
        for theta in (0.37 * scale, 2.1 * scale, 11.0 * scale):
            den = theta + ev
            if np.abs(den).min() < 1e-12 * scale:
                continue
            R = (np.diag(theta * d) + B) @ (V * (1.0 / den)) @ Q
            if np.abs(R - np.eye(n)).max() > tol:
                raise ValueError(
                    f"eigen-resolved solve residual "
                    f"{np.abs(R - np.eye(n)).max():.2e} exceeds {tol:.0e}")
        idx = off + inc * np.arange(n)
        Fy[np.ix_(idx, idx)] = Q
        Iy[np.ix_(idx, idx)] = V
        lam[idx] = ev
    return Fy, Iy, lam


def factorize(A):
    """Precompute the elimination of process_spectral_010_poisson
    (spectral_processing.f90:465-622) once: returns dict of factor arrays.

    A: (nx_spec, n, nz_spec, 5) float64, modified in-place like the kernel.
    """
    A = A.copy()
    n = A.shape[1]
    l1 = np.zeros((A.shape[0], n, A.shape[2]))
    l2 = np.zeros_like(l1)
    for j in range(n - 2):
        t1 = _guarded_div(A[:, j + 1, :, 1], A[:, j, :, 2])
        l1[:, j] = t1
        A[:, j + 1, :, 2] -= t1 * A[:, j, :, 3]
        A[:, j + 1, :, 3] -= t1 * A[:, j, :, 4]
        t2 = _guarded_div(A[:, j + 2, :, 0], A[:, j, :, 2])
        l2[:, j] = t2
        A[:, j + 2, :, 1] -= t2 * A[:, j, :, 3]
        A[:, j + 2, :, 2] -= t2 * A[:, j, :, 4]
    # last-row handling (kernel :538-588)
    tmp = _guarded_div(A[:, n - 1, :, 1], A[:, n - 2, :, 2])
    dnn = A[:, n - 1, :, 2] - tmp * A[:, n - 2, :, 3]
    inv_dnn = _guarded_div(np.ones_like(dnn), dnn)
    last_l = np.where(np.abs(dnn) > _EPS, tmp * inv_dnn, 0.0)
    inv_d = _guarded_div(np.ones_like(A[..., 2]), A[:, :, :, 2])
    return dict(
        l1=l1, l2=l2,
        inv_dnn=inv_dnn, last_l=last_l,
        inv_d=inv_d,  # 1/diag for back substitution (guarded)
        d4=A[..., 3], d5=A[..., 4],
    )


class StretchedYSolver:
    """Runtime solve over stacked parity sets, vectorised over modes.

    Input/output layout: (nx_spec, ny, nz_spec) real arrays (one per
    real/imag component), y-modes in natural spectral order. Separate
    factorisations for the real and imaginary components (the reference
    keeps a_re/a_im; they coincide on uniform-coefficient meshes).
    """

    def __init__(self, a_sets_re, a_sets_im, offsets, inc,
                 dtype=jnp.float32):
        self.inc = inc
        self.offsets = offsets

        def prep(a_sets):
            facs = []
            for A in a_sets:
                f = factorize(A)
                # 3-D factor arrays go to (n, nx_spec, nz) for lax.scan;
                # 2-D (last-row) factors stay (nx_spec, nz)
                facs.append({k: jnp.asarray(
                    np.moveaxis(v, 1, 0) if v.ndim == 3 else v, dtype=dtype)
                    for k, v in f.items()})
            return facs

        self.fac_re = prep(a_sets_re)
        self.fac_im = prep(a_sets_im)
        self.n = a_sets_re[0].shape[1]
        # Nyquist zeroing inside the kernel (ix==nx/2+1 & iz==nz/2+1)
        self.nx_spec = a_sets_re[0].shape[0]
        self.nz_spec = a_sets_re[0].shape[2]

    def _solve_one(self, fac, r):
        """r: (n, nx_spec, nz_spec). Forward/backward substitution as
        lax.scan 2-term linear recurrences."""
        n = self.n
        l1, l2 = fac["l1"], fac["l2"]

        # forward: y_j = r_j - l1_{j-1} y_{j-1} - l2_{j-2} y_{j-2}
        def fwd(carry, inp):
            ym1, ym2 = carry
            rj, l1m1, l2m2 = inp
            yj = rj - l1m1 * ym1 - l2m2 * ym2
            return (yj, ym1), yj

        zeros = jnp.zeros_like(r[0])
        l1_sh = jnp.concatenate([zeros[None], l1[:n - 1]], axis=0)
        l2_sh = jnp.concatenate([zeros[None], zeros[None], l2[:n - 2]],
                                axis=0)
        (_, _), y = jax.lax.scan(fwd, (zeros, zeros), (r, l1_sh, l2_sh))

        # last two rows (kernel :549-588)
        xn = y[n - 1] * fac["inv_dnn"] - fac["last_l"] * y[n - 2]
        xn1 = (y[n - 2] - fac["d4"][n - 2] * xn) * fac["inv_d"][n - 2]

        # backward: x_j = (y_j - d4_j x_{j+1} - d5_j x_{j+2}) * inv_d_j
        def bwd(carry, inp):
            xp1, xp2 = carry
            yj, d4, d5, invd = inp
            xj = (yj - d4 * xp1 - d5 * xp2) * invd
            return (xj, xp1), xj

        inputs = (y[:n - 2][::-1], fac["d4"][:n - 2][::-1],
                  fac["d5"][:n - 2][::-1], fac["inv_d"][:n - 2][::-1])
        (_, _), xr = jax.lax.scan(bwd, (xn1, xn), inputs)
        x = jnp.concatenate([xr[::-1], xn1[None], xn[None]], axis=0)
        return x

    def solve_component(self, comp, facs):
        """Solve one real component; input (nx_spec, ny, nz_spec)."""
        t = jnp.moveaxis(comp, 1, 0)  # (ny, nx_spec, nz)
        res = jnp.zeros_like(t)
        for fac, off in zip(facs, self.offsets):
            sub = t[off::self.inc]
            sol = self._solve_one(fac, sub)
            res = res.at[off::self.inc].set(sol)
        return jnp.moveaxis(res, 0, 1)

    def solve_packed(self, F, nx, nz):
        """Single packed-real-basis solve (matmul_poisson path)."""
        F = self.solve_component(F, self.fac_re)
        if nx % 2 == 0 and nz % 2 == 0 and nx // 2 < self.nx_spec \
                and nz // 2 < self.nz_spec:
            F = F.at[nx // 2, :, nz // 2].set(0.0)
        return F

    def __call__(self, dr, dc, nx, nz):
        """Solve both re/im components (FFT-pipeline path)."""
        dr = self.solve_component(dr, self.fac_re)
        dc = self.solve_component(dc, self.fac_im)
        # kernel Nyquist zero: ix==nx/2+1 and iz==nz/2+1 (1-based)
        if nx % 2 == 0 and nz % 2 == 0 and nx // 2 < self.nx_spec \
                and nz // 2 < self.nz_spec:
            dr = dr.at[nx // 2, :, nz // 2].set(0.0)
            dc = dc.at[nx // 2, :, nz // 2].set(0.0)
        return dr, dc
