"""Pallas resident-slab pressure projection kernels.

The projection's y/z stages — divergence y+z (transform-fused), the
spectral solve, and the gradient z+y stages (inverse-transform-fused) —
all operate within an (ny, nz) x-plane. Two Pallas kernels hold one
such slab VMEM-resident and run every stage back to back, so the ten
intermediate fields that the einsum path round-trips through HBM
(duv, dw_mid, F, q, p_z, dpdz, ... ~20 HBM passes at 512^3) collapse
to 4 + 4 passes:

    kernel 1 (div+solve):  du, dv, dw  ->  q      (3 reads, 1 write)
    kernel 2 (gradient):   q -> p_zy, dpdy, dpdz  (1 read, 3 writes)

The x stages (3 transform-fused matmuls before kernel 1 and after
kernel 2) stay as einsums: they contract the grid axis, which cannot be
slab-resident, and folding the x transform into them is cheaper than a
standalone transform pass.

Matmuls use the manual bf16 hi/lo-split scheme of pallas_kernels.py
(Mosaic only lowers DEFAULT/HIGHEST dot precisions): terms=2 gives
bf16x3 == Precision.HIGH, terms=3 gives bf16x6 == HIGHEST (KE-parity
mode). The solve diagonal -1/waves is rebuilt per slab from two (ny,nz)
tables and two per-plane scalars,

    waves(i) = k2x[i] * A + Tx[i]^2 * B,
    A = Ty^2 (x) Tz^2,   B = k2y (x) Tz^2 + Ty^2 (x) k2z,

the separable decomposition of matmul_poisson._inv_waves (reference
modified-wavenumber tables: poisson_fft.f90 waves_set:654-831).

VMEM at 512^3: 4 pipelined (1,512,512) f32 slabs (8 MB with double
buffering) + ~3-5 MB of resident matrices per kernel — inside the
~16 MB scoped budget (the single merged kernel was not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (_BAND_TOL, VMEM_LIMIT, _cparams,
                             _dot_split, _split, banded_blocks,
                             split_hi_lo)

_EPS = 1e-16  # matches matmul_poisson._EPS


def _mm_left(mat_refs, x, terms):
    """(m, k) split matrix parts @ (k, n) f32 slab -> (m, n) f32."""
    Ms = tuple(r[...] for r in mat_refs)
    xs = _split(x, terms)
    return _dot_split(Ms, xs, (((1,), (0,)), ((), ())))


def _mm_right(x, mat_refs, terms):
    """(m, k) f32 slab contracted with (n, k) split parts -> (m, n)."""
    Ms = tuple(r[...] for r in mat_refs)
    xs = _split(x, terms)
    return _dot_split(xs, Ms, (((1,), (1,)), ((), ())))


def _banded_left(mat_refs, x, nb, bs, w, terms):
    """Block-banded apply along axis 0 of a 2-D slab (periodic wrap):
    out block b = W[b] @ x[b*bs-w : b*bs+bs+w]. ~5x fewer flops than the
    dense (transform-folded) apply; the paired transform is applied
    densely ONCE to the combined field afterwards."""
    Ws = tuple(r[...] for r in mat_refs)   # (nb, bs, bs+2w) parts
    ext = jnp.concatenate([x[-w:], x, x[:w]], axis=0)
    outs = []
    for b in range(nb):
        win = ext[b * bs:b * bs + bs + 2 * w]
        outs.append(_dot_split(tuple(W[b] for W in Ws), _split(win, terms),
                               (((1,), (0,)), ((), ()))))
    return jnp.concatenate(outs, axis=0)


def parity_split(n):
    """Half-flop split of the real-DFT transform T = real_dft_matrix(n)
    by OUTPUT parity: even rows have period-n/2 columns and odd rows are
    antiperiodic (cos(2pi m (j+h)/n) = +/- cos(2pi m j/n) for even/odd
    m), so with h = n/2, Te = T[0::2, :h], To = T[1::2, :h]:

        T x  = interleave(Te (x1 + x2), To (x1 - x2)),  x1, x2 = halves

    — one radix-2 FFT level in matrix form: two half-size dense dots
    (half the MXU flops, K dims stay full tiles) + adds + an interleave
    relayout. No reversals and no twiddles (those appear only in deeper
    levels / the input-parity formulation; Mosaic has no rev lowering).
    The inverse follows from row orthogonality (Ti = T^T diag(w)):

        Ti y = concat(a + b, a - b),  a = Te^T z_e, b = To^T z_o,
        z = w (.) y interleaved-split.

    Returns (Te, To, w) float64; raises if the symmetry check fails."""
    from .matmul_poisson import real_dft_matrix
    h = n // 2
    T = real_dft_matrix(n)
    if (np.abs(T[0::2, :h] - T[0::2, h:]).max() > 1e-9
            or np.abs(T[1::2, :h] + T[1::2, h:]).max() > 1e-9):
        raise ValueError("transform lacks the parity column symmetry")
    TTt = T @ T.T
    if np.abs(TTt - np.diag(np.diag(TTt))).max() > 1e-9 * n:
        raise ValueError("transform rows not orthogonal")
    return T[0::2, :h].copy(), T[1::2, :h].copy(), 1.0 / np.diag(TTt)


def _bfly_fwd(te_parts, to_parts, x, terms):
    """Parity-split forward transform along axis 0 of a 2-D slab.

    Output rows are in BLOCK-PARITY order [even modes; odd modes] — the
    natural interleave is a sublane-granularity shuffle that costs more
    than the saved MXU time (measured 24.0 vs 21.1 ms on the mid
    kernel), so the permuted basis is kept and the mode-indexed solve
    tables are permuted host-side instead."""
    n, m = x.shape
    h = n // 2
    dn = (((1,), (0,)), ((), ()))
    Xe = _dot_split(tuple(r[...] for r in te_parts),
                    _split(x[:h] + x[h:], terms), dn)
    Xo = _dot_split(tuple(r[...] for r in to_parts),
                    _split(x[:h] - x[h:], terms), dn)
    return jnp.concatenate([Xe, Xo], axis=0)


def _bfly_inv(tet_parts, tot_parts, w_ref, y, terms):
    """Parity-split inverse transform along axis 0 of a 2-D slab; input
    rows in the block-parity order of _bfly_fwd (w_ref pre-permuted)."""
    n, m = y.shape
    h = n // 2
    z = w_ref[...] * y
    dn = (((1,), (0,)), ((), ()))
    a = _dot_split(tuple(r[...] for r in tet_parts),
                   _split(z[:h], terms), dn)
    b = _dot_split(tuple(r[...] for r in tot_parts),
                   _split(z[h:], terms), dn)
    return jnp.concatenate([a + b, a - b], axis=0)


def parity_split_folded(M, axis):
    """Parity split of a transform-FOLDED matrix on a periodic axis.

    axis=0 (forward-folded, M = T @ Op, Op circulant): rolling a column
    by h multiplies even-frequency rows by +1 and odd rows by -1 (the
    circulant Op preserves the transform's column symmetry), so with
    h = n_in/2:   M x = blockcat(Me (x1+x2), Mo (x1-x2)),
    Me = M[0::2, :h], Mo = M[1::2, :h]  — output modes in block-parity
    order, half the flops.

    axis=1 (inverse-folded, M = Op @ Ti): even-mode COLUMNS are
    h-periodic in the output index, odd-mode columns antiperiodic, so
    M z = [a + b; a - b],  a = Me z_e, b = Mo z_o with Me = M[:h, 0::2],
    Mo = M[:h, 1::2] and z in block-parity mode order.

    Returns (Me, Mo); raises when the symmetry does not hold."""
    n0, n1 = M.shape
    if axis == 0:
        h = n1 // 2
        if (np.abs(M[0::2, :h] - M[0::2, h:]).max() > 1e-9 * np.abs(M).max()
                or np.abs(M[1::2, :h] + M[1::2, h:]).max()
                > 1e-9 * np.abs(M).max()):
            raise ValueError("no forward parity symmetry")
        return M[0::2, :h].copy(), M[1::2, :h].copy()
    h = n0 // 2
    if (np.abs(M[:h, 0::2] - M[h:, 0::2]).max() > 1e-9 * np.abs(M).max()
            or np.abs(M[:h, 1::2] + M[h:, 1::2]).max()
            > 1e-9 * np.abs(M).max()):
        raise ValueError("no inverse parity symmetry")
    return M[:h, 0::2].copy(), M[:h, 1::2].copy()


def _psplit_right(x, e_parts, o_parts, terms):
    """x @ M^T for a forward-parity-split M acting on the LANE axis of a
    2-D slab: output columns (spectral modes) in block-parity order."""
    h = x.shape[1] // 2
    dn = (((1,), (1,)), ((), ()))
    E = _dot_split(_split(x[:, :h] + x[:, h:], terms),
                   tuple(r[...] for r in e_parts), dn)
    O = _dot_split(_split(x[:, :h] - x[:, h:], terms),
                   tuple(r[...] for r in o_parts), dn)
    return jnp.concatenate([E, O], axis=1)


def _div_solve_body(du, dv, dw, m1, tabs, terms, banded_y, nb, bs, w,
                    bfly=False, bfz=False, i=None):
    """Shared divergence-y/z + spectral-solve computation on one slab:
    m1 = y-stage matrix parts (banded Iy/Sy + dense Ty — or its
    butterfly split A + 4 diagonals — when banded_y, else
    transform-folded dense iy/sy) followed by iz, sz parts; tabs =
    (A, B, Myz, k2x, tx2, mx) refs. Returns the spectral solution q.

    `i` is this slab's index into the per-plane scalar tables; defaults
    to the Pallas grid position (the body also runs as plain JAX under
    vmap — make_mid_einsum — where the caller passes i explicitly)."""
    nparts = max(terms, 1)
    iy, sy = m1[:nparts], m1[nparts:2 * nparts]
    if banded_y and bfly:
        te = m1[2 * nparts:3 * nparts]
        to = m1[3 * nparts:4 * nparts]
        zo = 4 * nparts
    elif banded_y:
        ty = m1[2 * nparts:3 * nparts]
        zo = 3 * nparts
    else:
        zo = 2 * nparts
    if bfz:
        ize, izo = m1[zo:zo + nparts], m1[zo + nparts:zo + 2 * nparts]
        sze = m1[zo + 2 * nparts:zo + 3 * nparts]
        szo = m1[zo + 3 * nparts:zo + 4 * nparts]
    else:
        iz, sz = m1[zo:zo + nparts], m1[zo + nparts:zo + 2 * nparts]
    A_ref, B_ref, Myz_ref, k2x_ref, tx2_ref, mx_ref = tabs

    def zstage(duv, dwm):
        # divergence z stage (lane axis): F = Iz duv + Sz dwm, parity-
        # split to half flops when the z axis is periodic (bfz)
        if bfz:
            return (_psplit_right(duv, ize, izo, terms)
                    + _psplit_right(dwm, sze, szo, terms))
        return _mm_right(duv, iz, terms) + _mm_right(dwm, sz, terms)

    if banded_y:
        # factorized y stage: banded Iy/Sy then ONE dense Ty on each
        # combined field (flops: 2 dense + ~0.6 banded vs 3 dense);
        # with bfly the Ty runs as a parity split (half flops again)
        duv = (_banded_left(iy, du, nb, bs, w, terms)
               + _banded_left(sy, dv, nb, bs, w, terms))
        dwm = _banded_left(iy, dw, nb, bs, w, terms)
        F = zstage(duv, dwm)
        if bfly:
            F = _bfly_fwd(te, to, F, terms)
        else:
            F = _mm_left(ty, F, terms)
    else:
        # divergence y stage (axis 0 of the slab): duv = Iy du + Sy dv
        duv = _mm_left(iy, du, terms) + _mm_left(sy, dv, terms)
        dwm = _mm_left(iy, dw, terms)
        F = zstage(duv, dwm)
    # spectral solve: q = -F / waves, with the zero-wave guard and the
    # Nyquist-line mask of matmul_poisson._inv_waves: mx is the x-axis
    # hit indicator per plane, Myz the (y,z) hit indicator table, and
    # the zeroed set is their INTERSECTION (the reference kernels zero
    # only `i == nx/2+1 .and. k == nz/2+1`, spectral_processing.f90:216)
    if i is None:
        i = pl.program_id(0)
    waves = k2x_ref[i] * A_ref[...] + tx2_ref[i] * B_ref[...]
    ok = jnp.abs(waves) >= _EPS
    inv = jnp.where(ok, -1.0 / jnp.where(ok, waves, 1.0), 0.0)
    return F * inv * (1.0 - mx_ref[i] * Myz_ref[...])


def _grad_body(q, m2, terms, banded_y, nvy, nvz, nb, bs, w, bfly=False,
               bfz=False):
    """Shared gradient-z/y computation on one slab: m2 = gz_is parts
    (or their inverse parity split GE/GO when bfz) + y-stage parts
    (banded Iy'/Sy' + dense Ti_y — or its parity split Te^T/To^T + w —
    when banded_y, else folded gy_is/gy_i). Returns (p_zy, dpdy, dpdz)
    — still spectral in x; the x stage follows in its own kernel."""
    nparts = max(terms, 1)
    if bfz:
        # inverse parity split of the STACKED gz_is: q's z-modes are in
        # block-parity order, the even/odd column blocks act on each and
        # the physical halves reassemble as a +/- b (half the flops)
        ge, go = m2[:nparts], m2[nparts:2 * nparts]
        hm = q.shape[1] // 2
        h = nvz // 2
        dn = (((1,), (1,)), ((), ()))
        A = _dot_split(_split(q[:, :hm], terms),
                       tuple(r[...] for r in ge), dn)   # (ncy, 2h)
        B = _dot_split(_split(q[:, hm:], terms),
                       tuple(r[...] for r in go), dn)
        ai, as_ = A[:, :h], A[:, h:]
        bi, bs_ = B[:, :h], B[:, h:]
        p_z = jnp.concatenate([ai + bi, ai - bi], axis=1)
        dpdz_s = jnp.concatenate([as_ + bs_, as_ - bs_], axis=1)
        both_z = jnp.concatenate([p_z, dpdz_s], axis=1)
        yo = 2 * nparts
    else:
        gz_is = m2[:nparts]
        # gradient z stage, interp/stagder row-stacked into one dot
        both_z = _mm_right(q, gz_is, terms)      # (ncy, 2nvz)
        p_z = both_z[:, :nvz]
        dpdz_s = both_z[:, nvz:]
        yo = nparts
    if banded_y:
        # factorized: ONE dense Ti_y dot covering both fields (they are
        # already z-concatenated in both_z), then banded interp/stagder;
        # the shared interp also runs as one two-field banded apply
        giy = m2[yo:yo + nparts]
        gsy = m2[yo + nparts:yo + 2 * nparts]
        if bfly:
            tet = m2[yo + 2 * nparts:yo + 3 * nparts]
            tot = m2[yo + 3 * nparts:yo + 4 * nparts]
            GH = _bfly_inv(tet, tot, m2[yo + 4 * nparts], both_z, terms)
        else:
            tiy = m2[yo + 2 * nparts:yo + 3 * nparts]
            GH = _mm_left(tiy, both_z, terms)    # (ncy, 2nvz)
        both_i = _banded_left(giy, GH, nb, bs, w, terms)
        return (both_i[:, :nvz],
                _banded_left(gsy, GH[:, :nvz], nb, bs, w, terms),
                both_i[:, nvz:])
    # gradient y stage on p_z (stacked), plus the interp of dpdz
    gy_is, gy_i = m2[yo:yo + nparts], m2[yo + nparts:yo + 2 * nparts]
    both_y = _mm_left(gy_is, p_z, terms)         # (2nvy, nvz)
    return (both_y[:nvy], both_y[nvy:], _mm_left(gy_i, dpdz_s, terms))


def _n_mats1(terms, banded_y, bfly=False, bfz=False):
    np_ = max(terms, 1)
    y = 4 if (banded_y and bfly) else (3 if banded_y else 2)
    z = 4 if bfz else 2
    return (y + z) * np_


def _n_mats2(terms, banded_y, bfly=False, bfz=False):
    np_ = max(terms, 1)
    z = 2 if bfz else 1
    y = (2 + (2 if bfly else 1)) if banded_y else 2
    return (z + y) * np_ + (1 if banded_y and bfly else 0)


def _div_solve_kernel(*refs, terms, banded_y, nb=0, bs=0, w=0, bfly=False,
                      bfz=False):
    """refs: du, dv, dw slabs + m1 matrix parts + tables + out q."""
    du_ref, dv_ref, dw_ref = refs[:3]
    n1 = _n_mats1(terms, banded_y, bfly, bfz)
    m1 = refs[3:3 + n1]
    tabs = refs[3 + n1:3 + n1 + 6]
    q_ref = refs[3 + n1 + 6]
    q = _div_solve_body(du_ref[0], dv_ref[0], dw_ref[0], m1, tabs,
                        terms, banded_y, nb, bs, w, bfly, bfz)
    q_ref[0] = q.astype(q_ref.dtype)


def _grad_kernel(*refs, terms, nvy, nvz, banded_y, nb=0, bs=0, w=0,
                 bfly=False, bfz=False):
    """refs: q slab + m2 matrix parts + outs p_zy, dpdy, dpdz."""
    q_ref = refs[0]
    n2 = _n_mats2(terms, banded_y, bfly, bfz)
    m2 = refs[1:1 + n2]
    pzy_ref, dpdy_ref, dpdz_ref = refs[1 + n2:]
    p_zy, dpdy, dpdz = _grad_body(q_ref[0], m2, terms, banded_y,
                                  nvy, nvz, nb, bs, w, bfly, bfz)
    pzy_ref[0] = p_zy.astype(pzy_ref.dtype)
    dpdy_ref[0] = dpdy.astype(dpdy_ref.dtype)
    dpdz_ref[0] = dpdz.astype(dpdz_ref.dtype)


def _pressure_mid_kernel(*refs, terms, nvy, nvz, banded_y, nb, bs, w,
                         bfly=False, bfz=False, emit_q=True):
    """k1 and k2 merged: du,dv,dw -> [q,] p_zy, dpdy, dpdz with the
    spectral solution q never leaving VMEM between the stages (saves its
    HBM round-trip; enabled by the raised VMEM_LIMIT). With emit_q, q is
    also an output — the carried pressure state feeding the physical-p
    reconstruction under keep_pressure; without it (keep_pressure=False
    production steps) its HBM write is skipped entirely."""
    du_ref, dv_ref, dw_ref = refs[:3]
    n1 = _n_mats1(terms, banded_y, bfly, bfz)
    n2 = _n_mats2(terms, banded_y, bfly, bfz)
    m1 = refs[3:3 + n1]
    m2 = refs[3 + n1:3 + n1 + n2]
    tabs = refs[3 + n1 + n2:3 + n1 + n2 + 6]
    outs = refs[3 + n1 + n2 + 6:]
    if emit_q:
        q_ref, pzy_ref, dpdy_ref, dpdz_ref = outs
    else:
        pzy_ref, dpdy_ref, dpdz_ref = outs
    q = _div_solve_body(du_ref[0], dv_ref[0], dw_ref[0], m1, tabs,
                        terms, banded_y, nb, bs, w, bfly, bfz)
    if emit_q:
        q_ref[0] = q.astype(q_ref.dtype)
    p_zy, dpdy, dpdz = _grad_body(q, m2, terms, banded_y, nvy, nvz,
                                  nb, bs, w, bfly, bfz)
    pzy_ref[0] = p_zy.astype(pzy_ref.dtype)
    dpdy_ref[0] = dpdy.astype(dpdy_ref.dtype)
    dpdz_ref[0] = dpdz.astype(dpdz_ref.dtype)


# ---------------------------------------------------------------------------
# Tiled mid kernels: the merged mid at plane sizes beyond the VMEM cap.
#
# The mid's y-stage operators (banded interp/stagder + the parity-split
# transform) act on slab axis 0 and its z-stage operators on axis 1, so
# the two families COMMUTE as linear maps: (Ty (x) I)(I (x) Iz) =
# (I (x) Iz)(Ty (x) I). Reordering the merged body into y-ops / z-ops /
# y-ops groups lets each group tile the axis it does NOT contract:
#
#   M1 (grid nx, nz/tz; blocks (1, ny, tz)):
#       a = Ty (Iy du + Sy dv),  d = Ty (Iy dw)         [all y ops]
#   M2 (grid nx, ny/ty; blocks (1, ty, nz)):
#       F = Iz a + Sz d;  q = -F/waves (masked);
#       (p_z | dpdz_s) = q Gz_is^T                      [all z ops]
#   M3 (grid nx, nz/tz; blocks (1, ny, tz)):
#       GH = Ti_y [p_z | dpdz_s];  p_zy,dpdz = Giy GH;
#       dpdy = Gsy GH[:, p_z part]                      [all y ops]
#
# VMEM now scales with ny*tz / ty*nz instead of ny*nz, so 1024^2 (and
# larger) planes keep the kernel projection active — the flagship-size
# analogue of the reference's any-size cuFFTMp Poisson
# (/root/reference/src/backend/cuda/poisson_fft.f90:124-181). Cost vs
# the merged mid: the (a, d) and (p_z, dpdz_s) boundaries add 4 HBM
# passes (15 vs 11 with q) — far below the einsum replay or GSPMD
# spectral fallbacks. Only the production fast path is supported
# (banded+butterfly y, parity z, square uniform operators).
# ---------------------------------------------------------------------------


def _mid_t1_kernel(*refs, terms, nb, bs, w):
    """refs: du, dv, dw tiles + [biy, bsy, te, to] parts + outs a, d."""
    nparts = max(terms, 1)
    du_ref, dv_ref, dw_ref = refs[:3]
    m = refs[3:3 + 4 * nparts]
    biy = m[:nparts]
    bsy = m[nparts:2 * nparts]
    te = m[2 * nparts:3 * nparts]
    to = m[3 * nparts:4 * nparts]
    a_ref, d_ref = refs[3 + 4 * nparts:]
    duv = (_banded_left(biy, du_ref[0], nb, bs, w, terms)
           + _banded_left(bsy, dv_ref[0], nb, bs, w, terms))
    dwm = _banded_left(biy, dw_ref[0], nb, bs, w, terms)
    a_ref[0] = _bfly_fwd(te, to, duv, terms).astype(a_ref.dtype)
    d_ref[0] = _bfly_fwd(te, to, dwm, terms).astype(d_ref.dtype)


def _mid_t2_kernel(*refs, terms, nvz):
    """refs: a, d tiles + [ize, izo, sze, szo, GE, GO] parts + table
    tiles (A, B, Myz) + SMEM columns (k2x, tx2, mx) + outs q, p_z,
    dpdz_s. The y rows arrive in block-parity mode order (M1's
    butterfly), matching the q_perm-permuted table rows."""
    nparts = max(terms, 1)
    a_ref, d_ref = refs[:2]
    m = refs[2:2 + 6 * nparts]
    ize, izo = m[:nparts], m[nparts:2 * nparts]
    sze, szo = m[2 * nparts:3 * nparts], m[3 * nparts:4 * nparts]
    GE, GO = m[4 * nparts:5 * nparts], m[5 * nparts:6 * nparts]
    A_ref, B_ref, Myz_ref, k2x_ref, tx2_ref, mx_ref = \
        refs[2 + 6 * nparts:2 + 6 * nparts + 6]
    q_ref, pz_ref, dpdzs_ref = refs[2 + 6 * nparts + 6:]
    F = (_psplit_right(a_ref[0], ize, izo, terms)
         + _psplit_right(d_ref[0], sze, szo, terms))
    i = pl.program_id(0)
    waves = k2x_ref[i] * A_ref[...] + tx2_ref[i] * B_ref[...]
    ok = jnp.abs(waves) >= _EPS
    inv = jnp.where(ok, -1.0 / jnp.where(ok, waves, 1.0), 0.0)
    q = F * inv * (1.0 - mx_ref[i] * Myz_ref[...])
    q_ref[0] = q.astype(q_ref.dtype)
    # gradient z stage (inverse parity; _grad_body bfz branch)
    hm = q.shape[1] // 2
    h = nvz // 2
    dn = (((1,), (1,)), ((), ()))
    A2 = _dot_split(_split(q[:, :hm], terms),
                    tuple(r[...] for r in GE), dn)
    B2 = _dot_split(_split(q[:, hm:], terms),
                    tuple(r[...] for r in GO), dn)
    ai, as_ = A2[:, :h], A2[:, h:]
    bi, bs_ = B2[:, :h], B2[:, h:]
    pz_ref[0] = jnp.concatenate([ai + bi, ai - bi],
                                axis=1).astype(pz_ref.dtype)
    dpdzs_ref[0] = jnp.concatenate([as_ + bs_, as_ - bs_],
                                   axis=1).astype(dpdzs_ref.dtype)


def _mid_t3_kernel(*refs, terms, nb, bs, w, tz):
    """refs: p_z, dpdz_s tiles + [tet, tot, bgiy, bgsy, wvec] parts +
    outs p_zy, dpdy, dpdz."""
    nparts = max(terms, 1)
    pz_ref, dpdzs_ref = refs[:2]
    m = refs[2:2 + 4 * nparts + 1]
    tet = m[:nparts]
    tot = m[nparts:2 * nparts]
    bgiy = m[2 * nparts:3 * nparts]
    bgsy = m[3 * nparts:4 * nparts]
    wv_ref = m[4 * nparts]
    pzy_ref, dpdy_ref, dpdz_ref = refs[2 + 4 * nparts + 1:]
    both_z = jnp.concatenate([pz_ref[0], dpdzs_ref[0]], axis=1)
    GH = _bfly_inv(tet, tot, wv_ref, both_z, terms)
    both_i = _banded_left(bgiy, GH, nb, bs, w, terms)
    dpdy = _banded_left(bgsy, GH[:, :tz], nb, bs, w, terms)
    pzy_ref[0] = both_i[:, :tz].astype(pzy_ref.dtype)
    dpdy_ref[0] = dpdy.astype(dpdy_ref.dtype)
    dpdz_ref[0] = both_i[:, tz:].astype(dpdz_ref.dtype)


def _tiled_mid_tiles(ny, nz):
    """(ty, tz) for the tiled mid: largest Mosaic-aligned tiles that
    divide the plane; (None, None) when no admissible tiling exists."""
    ty = next((t for t in (128, 64, 32, 16, 8) if ny % t == 0), None)
    tz = next((t for t in (256, 128) if nz % t == 0), None)
    return ty, tz


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _plane_spec(ny, nz):
    return pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _scalar_spec(nx):
    # per-x-plane scalar tables: the whole (nx,) vector rides in SMEM and
    # the kernel indexes it by program_id (blocked 1-D SMEM specs hit the
    # lane-tiling rule)
    return pl.BlockSpec((nx,), lambda i: (0,), memory_space=pltpu.SMEM)


def slab_pressure_supported(ns, terms=3, structure_only=False) -> bool:
    """MatmulPoisson without stretching; slab dims obeying the Mosaic
    last-two-dims tiling rules (sublane % 8, lane % 128) for both the
    VERT-sized and CELL-sized y/z extents; merged-kernel VMEM footprint
    within the 64 MB scoped cap (so large-plane meshes fall back to the
    einsum path instead of failing at Mosaic compile time).

    `terms` defaults to the worst case (bf16x6) so a gate taken without
    knowing the precision mode stays conservative."""
    from ..common import DataLoc
    from .matmul_poisson import MatmulPoisson
    po = ns.poisson
    if not isinstance(po, MatmulPoisson) or po.stretch_solver is not None:
        return False
    ncx, ncy, ncz = po.nc
    nvx, nvy, nvz = ns.mesh.dims(DataLoc.VERT)
    if not (ncy % 8 == 0 and nvy % 8 == 0
            and ncz % 128 == 0 and nvz % 128 == 0
            and min(ncy, ncz) >= 128):
        return False
    if structure_only:
        # the caller provides a non-VMEM mid (make_mid_local.einsum);
        # only the structural gates above apply
        return True
    # merged mid-kernel VMEM footprint: double-buffered pipeline planes
    # (3 VERT inputs, q CELL + 3 VERT outputs), resident matrix parts
    # (dense worst case: m1 = iy,sy,iz,sz; m2 = gz_is,gy_is,gy_i as
    # bf16 x terms), 3 f32 (ny,nz) solve tables, plus ~4 plane-sized f32
    # temporaries live in the kernel body.
    planes = 2 * 4 * (6 * nvy * nvz + ncy * ncz)
    mats = 2 * terms * (2 * ncy * nvy + 2 * ncz * nvz
                        + nvz * ncz + 2 * nvy * ncy)
    tables = 3 * 4 * ncy * ncz
    scratch = 4 * 4 * max(ncy * ncz, nvy * nvz)
    vmem_cap = VMEM_LIMIT.vmem_limit_bytes
    return planes + mats + tables + scratch <= vmem_cap


def make_pressure_slab(ns, terms=2, interpret=False):
    """Build (div_solve_fn, grad_fn) over x-plane slabs.

    div_solve_fn(du, dv, dw) -> q   (spectral solve result, CELL dims)
    grad_fn(q) -> (p_zy, dpdy, dpdz)  (x stage still pending)
    """
    from ..common import DataLoc
    from .matmul_poisson import real_dft_matrix
    po = ns.poisson
    nx, ny, nz = po.nc
    _, nvy, nvz = ns.mesh.dims(DataLoc.VERT)
    d64 = ns._fp_mats64()

    def parts(M):
        return [jnp.asarray(p) for p in split_hi_lo(M, terms)]

    # banded-y factorization (periodic y only): replace the three
    # transform-folded dense y applies per kernel with block-banded
    # interp/stagder applies + ONE dense transform — ~30% fewer kernel
    # flops (the transform is applied to the combined field, not per
    # operand). Gated on the banded truncation check.
    oy = ns.ops[1]
    bw = 32 if terms >= 3 else 16
    bbs = 64
    banded_y = (1 not in po.folded and nvy == ny and ny % bbs == 0
                and oy.interpl_v2p.n_out == oy.interpl_v2p.n_in)
    bmats = {}
    if banded_y:
        try:
            for key, op in (("iy", oy.interpl_v2p), ("sy", oy.stagder_v2p),
                            ("giy", oy.interpl_p2v),
                            ("gsy", oy.stagder_p2v)):
                bmats[key] = banded_blocks(op, bw, bbs, tol=_BAND_TOL)
        except ValueError:
            banded_y = False
    # radix-2 butterfly split of the pure y transforms (half the dense
    # transform flops; X3D2_BFLY=0 keeps the dense Ty/Ti_y dots)
    import os as _os
    bfly = (banded_y and ny % 16 == 0
            and _os.environ.get("X3D2_BFLY", "1") != "0")
    if bfly:
        try:
            Teb, Tob, wvec = parity_split(ny)
        except ValueError:
            bfly = False
    # z-stage parity split (periodic z): the transform-folded z
    # matrices are circulant compositions, so the same half-period
    # column/row symmetry halves their dense flops (parity_split_folded)
    bfz = (2 not in po.folded and nvz == nz and nz % 16 == 0
           and _os.environ.get("X3D2_BFLY", "1") != "0")
    if bfz:
        try:
            Ize, Izo = parity_split_folded(d64["iz"], 0)
            Sze, Szo = parity_split_folded(d64["sz"], 0)
            Gie, Gio = parity_split_folded(d64["gz_i"], 1)
            Gse, Gso = parity_split_folded(d64["gz_s"], 1)
            GE = np.concatenate([Gie, Gse], axis=0)
            GO = np.concatenate([Gio, Gso], axis=0)
        except ValueError:
            bfz = False
    if bfz:
        z1 = parts(Ize) + parts(Izo) + parts(Sze) + parts(Szo)
        z2 = parts(GE) + parts(GO)
    else:
        z1 = parts(d64["iz"]) + parts(d64["sz"])
        z2 = parts(d64["gz_is"])
    if banded_y and bfly:
        # w indexed by the block-parity mode order of _bfly_fwd
        w_perm = np.concatenate([wvec[0::2], wvec[1::2]])
        m1 = parts(bmats["iy"]) + parts(bmats["sy"]) + parts(Teb) \
            + parts(Tob) + z1
        m2 = z2 + parts(bmats["giy"]) \
            + parts(bmats["gsy"]) + parts(Teb.T) + parts(Tob.T) \
            + [jnp.asarray(w_perm.reshape(ny, 1), jnp.float32)]
    elif banded_y:
        Ty64 = real_dft_matrix(ny)
        Tiy64 = np.linalg.inv(Ty64)
        m1 = parts(bmats["iy"]) + parts(bmats["sy"]) + parts(Ty64) + z1
        m2 = z2 + parts(bmats["giy"]) \
            + parts(bmats["gsy"]) + parts(Tiy64)
    else:
        m1 = parts(d64["iy"]) + parts(d64["sy"]) + z1
        m2 = z2 + parts(d64["gy_is"]) + parts(d64["gy_i"])

    # separable solve-diagonal tables (see module docstring); tab_A/tab_B
    # carry either the uniform modified-wavenumber decomposition or the
    # eigen-resolved stretched-y one (matmul_poisson)
    k2x = po.k2_1d[0]
    Tx = po.T_1d[0]
    A = np.asarray(po.tab_A, np.float64)
    B = np.asarray(po.tab_B, np.float64)
    # Nyquist-line INDICATORS: the zeroed set is the intersection of the
    # named axes' Nyquist indices (mask applied as 1 - mx*Myz in-kernel)
    if po._zero_idx is not None:
        mx = (np.ones(nx) if 0 not in po._zero_idx
              else (np.arange(nx) == nx // 2).astype(np.float64))
        my = (np.ones(ny) if 1 not in po._zero_idx
              else (np.arange(ny) == ny // 2).astype(np.float64))
        mz = (np.ones(nz) if 2 not in po._zero_idx
              else (np.arange(nz) == nz // 2).astype(np.float64))
        Myz = np.outer(my, mz)
    else:
        mx = np.zeros(nx)
        Myz = np.zeros((ny, nz))
    q_perm = None
    if banded_y and bfly:
        # block-parity spectral y ordering (see _bfly_fwd): permute the
        # mode-indexed table rows instead of interleaving in-kernel
        q_perm = np.concatenate([np.arange(0, ny, 2), np.arange(1, ny, 2)])
        A, B, Myz = A[q_perm], B[q_perm], Myz[q_perm]
    z_perm = None
    if bfz:
        # block-parity spectral z ordering of q: permute table COLUMNS
        z_perm = np.concatenate([np.arange(0, nz, 2), np.arange(1, nz, 2)])
        A, B, Myz = A[:, z_perm], B[:, z_perm], Myz[:, z_perm]

    # x-stage applies: parity-split kernels (half the flops; the x modes
    # then live in block-parity order, so the per-plane solve tables are
    # permuted to match) with a dense fallback when the x axis is not
    # periodic-even. All six kernels must agree on the ordering.
    xk = {}
    x_perm = None
    try:
        if _os.environ.get("X3D2_BFLY", "1") == "0":
            raise ValueError("parity splits disabled")
        for name in ("sx", "ix"):
            xk[name] = make_x_apply(d64[name], terms=terms,
                                    interpret=interpret, parity="fwd")
        for name in ("gx_s", "gx_i"):
            xk[name] = make_x_apply(d64[name], terms=terms,
                                    interpret=interpret, parity="inv")
            xk[name + "_sub"] = make_x_apply(d64[name], terms=terms,
                                             sub=True, interpret=interpret,
                                             parity="inv")
        x_perm = np.concatenate([np.arange(0, nx, 2),
                                 np.arange(1, nx, 2)])
        k2x, mx = k2x[x_perm], mx[x_perm]
        Tx = Tx[x_perm]
        if _os.environ.get("X3D2_MERGED_X", "1") != "0":
            # merged 3-field x-stage kernels: 6/9 concurrent DMA
            # streams per grid step vs 2/3 in the per-field kernels
            # (measured on-chip: see validation/prof_pressure_r4.log)
            xk["div3"] = make_x_div3(d64["sx"], d64["ix"], terms=terms,
                                     interpret=interpret)
            xk["gradsub3"] = make_x_gradsub3(d64["gx_s"], d64["gx_i"],
                                             terms=terms,
                                             interpret=interpret)
    except ValueError:
        xk = {}
        for name in ("sx", "ix", "gx_s", "gx_i"):
            xk[name] = make_x_apply(d64[name], terms=terms,
                                    interpret=interpret)
        for name in ("gx_s", "gx_i"):
            xk[name + "_sub"] = make_x_apply(d64[name], terms=terms,
                                             sub=True,
                                             interpret=interpret)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    tables = [f32(A), f32(B), f32(Myz), f32(k2x), f32(Tx ** 2), f32(mx)]

    cell_plane = _plane_spec(ny, nz)
    vert_plane = _plane_spec(nvy, nvz)
    grid = (nx,)

    nb = ny // bbs
    k1 = functools.partial(_div_solve_kernel, terms=terms,
                           banded_y=banded_y, nb=nb, bs=bbs, w=bw,
                           bfly=bfly, bfz=bfz)
    k1_specs = ([vert_plane] * 3
                + [_const_spec(p.shape) for p in m1]
                + [_const_spec((ny, nz))] * 3 + [_scalar_spec(nx)] * 3)

    def div_solve_fn(du, dv, dw):
        return pl.pallas_call(
            k1, grid=grid, in_specs=k1_specs, out_specs=cell_plane,
            out_shape=jax.ShapeDtypeStruct((nx, ny, nz), du.dtype),
            interpret=interpret,
            compiler_params=_cparams(1),
        )(du, dv, dw, *m1, *tables)

    k2 = functools.partial(_grad_kernel, terms=terms, nvy=nvy, nvz=nvz,
                           banded_y=banded_y, nb=nb, bs=bbs, w=bw,
                           bfly=bfly, bfz=bfz)
    k2_specs = [cell_plane] + [_const_spec(p.shape) for p in m2]

    def grad_fn(q):
        return pl.pallas_call(
            k2, grid=grid, in_specs=k2_specs, out_specs=[vert_plane] * 3,
            out_shape=[jax.ShapeDtypeStruct((nx, nvy, nvz), q.dtype)] * 3,
            interpret=interpret,
            compiler_params=_cparams(1),
        )(q, *m2)

    # merged k1+k2: the spectral solution q stays VMEM-resident between
    # the divergence/solve and gradient stages (saves its HBM read)
    kmid = functools.partial(_pressure_mid_kernel, terms=terms, nvy=nvy,
                             nvz=nvz, banded_y=banded_y,
                             nb=nb, bs=bbs, w=bw, bfly=bfly, bfz=bfz)
    kmid_specs = ([vert_plane] * 3
                  + [_const_spec(p.shape) for p in m1]
                  + [_const_spec(p.shape) for p in m2]
                  + [_const_spec((ny, nz))] * 3 + [_scalar_spec(nx)] * 3)

    def mid_fn(du, dv, dw):
        return pl.pallas_call(
            kmid, grid=grid, in_specs=kmid_specs,
            out_specs=[cell_plane] + [vert_plane] * 3,
            out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), du.dtype)]
            + [jax.ShapeDtypeStruct((nx, nvy, nvz), du.dtype)] * 3,
            interpret=interpret,
            compiler_params=_cparams(1),
        )(du, dv, dw, *m1, *m2, *tables)

    kmid_nq = functools.partial(kmid, emit_q=False)

    def mid_nq_fn(du, dv, dw):
        """mid_fn without the q output: the spectral solution's 4-byte/pt
        HBM write is dropped (keep_pressure=False steps never read it)."""
        return pl.pallas_call(
            kmid_nq, grid=grid, in_specs=kmid_specs,
            out_specs=[vert_plane] * 3,
            out_shape=[jax.ShapeDtypeStruct((nx, nvy, nvz), du.dtype)] * 3,
            interpret=interpret,
            compiler_params=_cparams(1),
        )(du, dv, dw, *m1, *m2, *tables)

    mid_fn.no_q = mid_nq_fn

    def make_mid_local(nx_loc):
        """Mid-kernel variant for the repencilled sharded projection:
        grid over a LOCAL x-plane batch, with the per-plane solve tables
        (k2x, Tx^2, mx slices for this shard's global x range) passed as
        runtime arguments instead of baked-in constants."""
        lspecs = ([_plane_spec(nvy, nvz)] * 3
                  + [_const_spec(p.shape) for p in m1]
                  + [_const_spec(p.shape) for p in m2]
                  + [_const_spec((ny, nz))] * 3 + [_scalar_spec(nx_loc)] * 3)

        def mid_local(du, dv, dw, k2x_l, tx2_l, mx_l):
            return pl.pallas_call(
                kmid, grid=(nx_loc,), in_specs=lspecs,
                out_specs=[_plane_spec(ny, nz)]
                + [_plane_spec(nvy, nvz)] * 3,
                out_shape=[jax.ShapeDtypeStruct((nx_loc, ny, nz),
                                                du.dtype)]
                + [jax.ShapeDtypeStruct((nx_loc, nvy, nvz), du.dtype)] * 3,
                interpret=interpret,
                compiler_params=VMEM_LIMIT,
            )(du, dv, dw, *m1, *m2, tables[0], tables[1], tables[2],
              k2x_l, tx2_l, mx_l)

        return mid_local

    def make_mid_einsum(nx_loc):
        """Plain-XLA replay of the merged mid kernel over a local
        x-plane batch: the SAME m1/m2 split matrices, solve tables and
        stage bodies (_div_solve_body/_grad_body run as ordinary JAX
        under vmap), so the arithmetic is identical to the Pallas mid.
        Used by the repencilled sharded projection when a full
        (y,z)-plane kernel exceeds the VMEM cap — e.g. 1024^2 planes at
        1024^3 cost 112-126 MB vs the 64 MB limit (docs/SCALING.md) —
        where the alternative is GSPMD all-reducing full spectral
        fields (~5x the repencil's all-to-all volume per chip)."""

        def per_plane(du_p, dv_p, dw_p, k2, tx2, mxi):
            tabs = (tables[0], tables[1], tables[2],
                    k2[None], tx2[None], mxi[None])
            q = _div_solve_body(du_p, dv_p, dw_p, m1, tabs, terms,
                                banded_y, nb, bbs, bw, bfly, bfz, i=0)
            p_zy, dpdy, dpdz = _grad_body(q, m2, terms, banded_y,
                                          nvy, nvz, nb, bbs, bw,
                                          bfly, bfz)
            dt = du_p.dtype
            return (q.astype(dt), p_zy.astype(dt), dpdy.astype(dt),
                    dpdz.astype(dt))

        def mid_einsum(du, dv, dw, k2x_l, tx2_l, mx_l):
            return jax.vmap(per_plane)(du, dv, dw, k2x_l, tx2_l, mx_l)

        return mid_einsum

    # --- tiled mid (plane sizes beyond the VMEM cap) --------------------
    ty_t, tz_t = _tiled_mid_tiles(ny, nz)
    tiled_ok = (banded_y and bfly and bfz and nvy == ny and nvz == nz
                and ty_t is not None and tz_t is not None)
    if tiled_ok:
        # conservative per-kernel VMEM: double-buffered pipeline tiles +
        # resident matrix parts + ~6 tile-sized f32 live temporaries
        by = 2 * terms * nb * bbs * (bbs + 2 * bw)       # banded pair
        tf = 2 * terms * (ny // 2) ** 2                  # Te/To pair
        zp = 4 * terms * (nz // 2) ** 2                  # Ize..Szo
        gz = 2 * terms * nvz * (nz // 2)                 # GE/GO
        v1 = 2 * 4 * 5 * ny * tz_t + 2 * (by + tf) + 6 * 4 * ny * tz_t
        v2 = (2 * 4 * 5 * ty_t * nz + 2 * (zp + gz)
              + 2 * 3 * 4 * ty_t * nz + 6 * 4 * ty_t * nz)
        v3 = 2 * 4 * 5 * ny * tz_t + 2 * (tf + by) + 6 * 4 * ny * tz_t
        tiled_ok = max(v1, v2, v3) <= VMEM_LIMIT.vmem_limit_bytes

    def make_mid_tiled(nx_loc):
        """Tiled replacement for make_mid_local at plane sizes whose
        full-(y,z) kernel exceeds the VMEM cap: the three commuting-
        stage kernels above, same signature and same results as the
        merged mid up to fp reassociation of the stage order."""
        if not tiled_ok:
            raise ValueError("tiled mid needs the periodic-even fast "
                             "path (banded+butterfly y, parity z)")
        m_t1 = (parts(bmats["iy"]) + parts(bmats["sy"]) + parts(Teb)
                + parts(Tob))
        m_t2 = (parts(Ize) + parts(Izo) + parts(Sze) + parts(Szo)
                + parts(GE) + parts(GO))
        m_t3 = (parts(Teb.T) + parts(Tob.T) + parts(bmats["giy"])
                + parts(bmats["gsy"])
                + [jnp.asarray(w_perm.reshape(ny, 1), jnp.float32)])

        zspec = pl.BlockSpec((1, ny, tz_t), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        yspec = pl.BlockSpec((1, ty_t, nz), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        tabspec = pl.BlockSpec((ty_t, nz), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)
        scal2 = pl.BlockSpec((nx_loc,), lambda i, j: (0,),
                             memory_space=pltpu.SMEM)
        k1 = functools.partial(_mid_t1_kernel, terms=terms, nb=nb,
                               bs=bbs, w=bw)
        k2 = functools.partial(_mid_t2_kernel, terms=terms, nvz=nvz)
        k3 = functools.partial(_mid_t3_kernel, terms=terms, nb=nb,
                               bs=bbs, w=bw, tz=tz_t)
        t1_specs = [zspec] * 3 + [_const_spec(p.shape) for p in m_t1]
        t2_specs = ([yspec] * 2 + [_const_spec(p.shape) for p in m_t2]
                    + [tabspec] * 3 + [scal2] * 3)
        t3_specs = [zspec] * 2 + [_const_spec(np.asarray(p).shape)
                                  for p in m_t3]

        def mid_tiled(du, dv, dw, k2x_l, tx2_l, mx_l):
            gz_ = (nx_loc, nz // tz_t)
            gy_ = (nx_loc, ny // ty_t)
            a, d = pl.pallas_call(
                k1, grid=gz_, in_specs=t1_specs, out_specs=[zspec] * 2,
                out_shape=[jax.ShapeDtypeStruct((nx_loc, ny, nz),
                                                du.dtype)] * 2,
                interpret=interpret, compiler_params=_cparams(2),
            )(du, dv, dw, *m_t1)
            q, p_z, dpdz_s = pl.pallas_call(
                k2, grid=gy_, in_specs=t2_specs, out_specs=[yspec] * 3,
                out_shape=[jax.ShapeDtypeStruct((nx_loc, ny, nz),
                                                du.dtype)] * 3,
                interpret=interpret, compiler_params=_cparams(2),
            )(a, d, *m_t2, tables[0], tables[1], tables[2],
              k2x_l, tx2_l, mx_l)
            p_zy, dpdy, dpdz = pl.pallas_call(
                k3, grid=gz_, in_specs=t3_specs, out_specs=[zspec] * 3,
                out_shape=[jax.ShapeDtypeStruct((nx_loc, ny, nz),
                                                du.dtype)] * 3,
                interpret=interpret, compiler_params=_cparams(2),
            )(p_z, dpdz_s, *m_t3)
            return q, p_zy, dpdy, dpdz

        return mid_tiled

    make_mid_local.einsum = make_mid_einsum
    make_mid_local.tiled = make_mid_tiled
    make_mid_local.tiled_supported = tiled_ok

    # expose the solve tables so the sharded repencilled projection can
    # slice the SAME arrays per shard instead of re-deriving them
    make_mid_local.tables = tables

    # block-parity q basis (bfly/bfz): consumers reconstructing physical
    # p use column-permuted inverse transforms (zero runtime cost)
    ti_y = jnp.asarray(po.Ti[1])
    if q_perm is not None:
        ti_y = jnp.asarray(np.asarray(po.Ti[1])[:, q_perm])
    ti_z = jnp.asarray(po.Ti[2])
    if z_perm is not None:
        ti_z = jnp.asarray(np.asarray(po.Ti[2])[:, z_perm])
    ti_x = jnp.asarray(po.Ti[0])
    if x_perm is not None:
        ti_x = jnp.asarray(np.asarray(po.Ti[0])[:, x_perm])
    for f in (div_solve_fn, grad_fn, mid_fn, make_mid_local):
        f.q_perm = q_perm
        f.z_perm = z_perm
        f.x_perm = x_perm
        f.ti_y = ti_y
        f.ti_z = ti_z
        f.ti_x = ti_x
    return div_solve_fn, grad_fn, xk, mid_fn, make_mid_local


# ---------------------------------------------------------------------------
# Dense x-stage kernels: the projection's remaining einsums.
#
# An XLA HIGH einsum runs its three bf16 MXU passes without overlapping
# the HBM streaming (measured 5.2 ms per 512^3 apply = flops + traffic
# added, ~26 TF/s useful), while the same contraction inside a Pallas
# kernel with manual bf16 splits pipelines DMA against the MXU
# (~2.8 ms, ~51 TF/s — the slab kernels above). These kernels put the
# x-stage applies (transform-folded divergence inputs and gradient
# outputs) on the same footing, with the velocity-correction subtraction
# fused into the gradient stage.
# ---------------------------------------------------------------------------


def _x_apply_kernel(*refs, terms, sub, nk):
    """refs: f block (kb, t1, t2) [+ s block (n_out, t1, t2) when sub]
    + matrix K-blocks (n_out, kb) + out (n_out, t1, t2). The x
    contraction is K-blocked over the innermost grid dim: partial
    products accumulate in the resident out block, and the final K step
    applies `s - sum` (the fused pressure-correction update)."""
    f_ref = refs[0]
    i = 1
    s_ref = None
    if sub:
        s_ref = refs[1]
        i = 2
    nparts = max(terms, 1)
    m = refs[i:i + nparts]
    out_ref = refs[i + nparts]
    k = pl.program_id(2)
    f = f_ref[...]
    sh = f.shape
    r = _mm_left(m, f.reshape(sh[0], -1), terms)
    r = r.reshape((r.shape[0],) + sh[1:])

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + r.astype(out_ref.dtype)

    @pl.when(k == 0)
    def _():
        out_ref[...] = r.astype(out_ref.dtype)

    if sub:
        @pl.when(k == nk - 1)
        def _():
            out_ref[...] = s_ref[...] - out_ref[...]


def _kblock(n_in, kb=256):
    """Largest power-of-two K block <= kb dividing n_in (1 if n_in is
    odd)."""
    while n_in % kb:
        kb //= 2
    return kb


def _x_parity_fwd_kernel(*refs, terms, nk, ho):
    """Parity-split forward x apply: two K streams feed the two input
    halves; even/odd-mode partial dots accumulate into the out halves
    (output modes in block-parity order, half the flops)."""
    fa_ref, fb_ref = refs[:2]
    nparts = max(terms, 1)
    me = refs[2:2 + nparts]
    mo = refs[2 + nparts:2 + 2 * nparts]
    out_ref = refs[2 + 2 * nparts]
    k = pl.program_id(2)
    fa, fb = fa_ref[...], fb_ref[...]
    sh = fa.shape
    s = (fa + fb).reshape(sh[0], -1)
    d = (fa - fb).reshape(sh[0], -1)
    E = _mm_left(me, s, terms).reshape((ho,) + sh[1:])
    O = _mm_left(mo, d, terms).reshape((ho,) + sh[1:])

    @pl.when(k > 0)
    def _():
        out_ref[:ho] = out_ref[:ho] + E.astype(out_ref.dtype)
        out_ref[ho:] = out_ref[ho:] + O.astype(out_ref.dtype)

    @pl.when(k == 0)
    def _():
        out_ref[:ho] = E.astype(out_ref.dtype)
        out_ref[ho:] = O.astype(out_ref.dtype)


def _x_parity_inv_kernel(*refs, terms, sub, nk, h):
    """Parity-split inverse x apply: the two K streams read the
    even/odd-mode halves of the (block-parity-ordered) spectral input;
    the physical output assembles as [a + b; a - b] on the last K step
    (with the fused correction subtract when `sub`)."""
    ze_ref, zo_ref = refs[:2]
    i = 2
    s_ref = None
    if sub:
        s_ref = refs[2]
        i = 3
    nparts = max(terms, 1)
    me = refs[i:i + nparts]
    mo = refs[i + nparts:i + 2 * nparts]
    out_ref = refs[i + 2 * nparts]
    k = pl.program_id(2)
    ze, zo = ze_ref[...], zo_ref[...]
    sh = ze.shape
    A = _mm_left(me, ze.reshape(sh[0], -1), terms).reshape((h,) + sh[1:])
    B = _mm_left(mo, zo.reshape(sh[0], -1), terms).reshape((h,) + sh[1:])

    @pl.when(k > 0)
    def _():
        out_ref[:h] = out_ref[:h] + A.astype(out_ref.dtype)
        out_ref[h:] = out_ref[h:] + B.astype(out_ref.dtype)

    @pl.when(k == 0)
    def _():
        out_ref[:h] = A.astype(out_ref.dtype)
        out_ref[h:] = B.astype(out_ref.dtype)

    @pl.when(k == nk - 1)
    def _():
        a = out_ref[:h]
        b = out_ref[h:]
        full = jnp.concatenate([a + b, a - b], axis=0)
        if sub:
            out_ref[...] = s_ref[...] - full
        else:
            out_ref[...] = full


def _x_parity_fwd3_kernel(*refs, terms, nk, ho):
    """Merged parity-split forward x apply for the THREE divergence
    inputs: one kernel reads u, v, w (two half streams each) and emits
    du = Sx u, dv = Ix v, dw = Ix w. Six concurrent input streams per
    grid step give the DMA pipeline ~3x the outstanding traffic of the
    single-field kernel (measured: balanced r+w Pallas kernels are
    DMA-bound well below spec; more streams per step raise utilisation
    — the 12-stream XLA AB update hits ~730 GB/s vs ~220 single-stream
    Pallas)."""
    nparts = max(terms, 1)
    fa = refs[0:6:2]
    fb = refs[1:6:2]
    me_s = refs[6:6 + nparts]
    mo_s = refs[6 + nparts:6 + 2 * nparts]
    me_i = refs[6 + 2 * nparts:6 + 3 * nparts]
    mo_i = refs[6 + 3 * nparts:6 + 4 * nparts]
    outs = refs[6 + 4 * nparts:]
    k = pl.program_id(2)
    for c in range(3):
        me, mo = (me_s, mo_s) if c == 0 else (me_i, mo_i)
        a, b = fa[c][...], fb[c][...]
        sh = a.shape
        s = (a + b).reshape(sh[0], -1)
        d = (a - b).reshape(sh[0], -1)
        E = _mm_left(me, s, terms).reshape((ho,) + sh[1:])
        O = _mm_left(mo, d, terms).reshape((ho,) + sh[1:])
        out_ref = outs[c]

        @pl.when(k > 0)
        def _():
            out_ref[:ho] = out_ref[:ho] + E.astype(out_ref.dtype)
            out_ref[ho:] = out_ref[ho:] + O.astype(out_ref.dtype)

        @pl.when(k == 0)
        def _():
            out_ref[:ho] = E.astype(out_ref.dtype)
            out_ref[ho:] = O.astype(out_ref.dtype)


def _x_parity_gradsub3_kernel(*refs, terms, nk, h):
    """Merged parity-split inverse x apply + fused velocity correction:
    one kernel reads the three spectral gradient fields (block-parity
    mode halves) and u, v, w, and writes u - Gxs p_zy, v - Gxi dpdy,
    w - Gxi dpdz — nine concurrent streams per grid step."""
    nparts = max(terms, 1)
    ze = refs[0:6:2]
    zo = refs[1:6:2]
    s_refs = refs[6:9]
    me_s = refs[9:9 + nparts]
    mo_s = refs[9 + nparts:9 + 2 * nparts]
    me_i = refs[9 + 2 * nparts:9 + 3 * nparts]
    mo_i = refs[9 + 3 * nparts:9 + 4 * nparts]
    outs = refs[9 + 4 * nparts:]
    k = pl.program_id(2)
    for c in range(3):
        me, mo = (me_s, mo_s) if c == 0 else (me_i, mo_i)
        zec, zoc = ze[c][...], zo[c][...]
        sh = zec.shape
        A = _mm_left(me, zec.reshape(sh[0], -1),
                     terms).reshape((h,) + sh[1:])
        B = _mm_left(mo, zoc.reshape(sh[0], -1),
                     terms).reshape((h,) + sh[1:])
        out_ref = outs[c]
        s_ref = s_refs[c]

        @pl.when(k > 0)
        def _():
            out_ref[:h] = out_ref[:h] + A.astype(out_ref.dtype)
            out_ref[h:] = out_ref[h:] + B.astype(out_ref.dtype)

        @pl.when(k == 0)
        def _():
            out_ref[:h] = A.astype(out_ref.dtype)
            out_ref[h:] = B.astype(out_ref.dtype)

        @pl.when(k == nk - 1)
        def _():
            a = out_ref[:h]
            b = out_ref[h:]
            out_ref[...] = s_ref[...] - jnp.concatenate(
                [a + b, a - b], axis=0)


def make_x_div3(sx64, ix64, terms=2, t1=8, t2=128, kb=256,
                interpret=False):
    """Merged forward x-stage: fn(u, v, w) -> (du, dv, dw) with
    du = (Tx Sx) u, dv = dw = (Tx Ix) v|w, block-parity output modes
    (periodic-even x only; raises ValueError otherwise)."""
    n_out, n_in = sx64.shape
    if ix64.shape != (n_out, n_in):
        raise ValueError("sx/ix must share shapes")
    if n_in % 2 or n_out % 2:
        raise ValueError("parity x-apply needs even extents")
    mats = []
    for M64 in (sx64, ix64):
        Me, Mo = parity_split_folded(np.asarray(M64, np.float64), 0)
        mats.append([jnp.asarray(p) for p in split_hi_lo(Me, terms)])
        mats.append([jnp.asarray(p) for p in split_hi_lo(Mo, terms)])
    me_s, mo_s, me_i, mo_i = mats
    h_in = n_in // 2
    ho = n_out // 2
    kbp = _kblock(h_in, kb)
    if kbp < 8:
        kbp = h_in
    nk = h_in // kbp
    fa_spec = pl.BlockSpec((kbp, t1, t2), lambda i, j, k: (k, i, j),
                           memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((kbp, t1, t2),
                           lambda i, j, k, nk=nk: (k + nk, i, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_out, t1, t2), lambda i, j, k: (0, i, j),
                            memory_space=pltpu.VMEM)
    pm_spec = pl.BlockSpec((ho, kbp), lambda i, j, k: (0, k),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_x_parity_fwd3_kernel, terms=terms, nk=nk,
                             ho=ho)
    nparts = max(terms, 1)

    def fn(u, v, w):
        ny, nz = u.shape[1], u.shape[2]
        if ny % t1 or nz % t2 or ny < t1 or nz < t2:
            raise ValueError(f"x-div3 tiling ({t1},{t2}) cannot cover "
                             f"({ny},{nz})")
        grid = (ny // t1, nz // t2, nk)
        specs = [fa_spec, fb_spec] * 3 + [pm_spec] * (4 * nparts)
        return pl.pallas_call(
            kern, grid=grid, in_specs=specs, out_specs=[out_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((n_out, ny, nz),
                                            u.dtype)] * 3,
            interpret=interpret,
            compiler_params=VMEM_LIMIT,
        )(u, u, v, v, w, w, *me_s, *mo_s, *me_i, *mo_i)

    return fn


def make_x_gradsub3(gxs64, gxi64, terms=2, t1=8, t2=128, kb=256,
                    interpret=False):
    """Merged inverse x-stage + correction: fn(p_zy, dpdy, dpdz, u, v, w)
    -> (u - Gxs p_zy, v - Gxi dpdy, w - Gxi dpdz). Spectral inputs in
    block-parity mode order (periodic-even x only)."""
    n_out, n_in = gxs64.shape
    if gxi64.shape != (n_out, n_in):
        raise ValueError("gxs/gxi must share shapes")
    if n_in % 2 or n_out % 2:
        raise ValueError("parity x-apply needs even extents")
    mats = []
    for M64 in (gxs64, gxi64):
        Me, Mo = parity_split_folded(np.asarray(M64, np.float64), 1)
        mats.append([jnp.asarray(p) for p in split_hi_lo(Me, terms)])
        mats.append([jnp.asarray(p) for p in split_hi_lo(Mo, terms)])
    me_s, mo_s, me_i, mo_i = mats
    h_in = n_in // 2
    h = n_out // 2
    kbp = _kblock(h_in, kb)
    if kbp < 8:
        kbp = h_in
    nk = h_in // kbp
    ze_spec = pl.BlockSpec((kbp, t1, t2), lambda i, j, k: (k, i, j),
                           memory_space=pltpu.VMEM)
    zo_spec = pl.BlockSpec((kbp, t1, t2),
                           lambda i, j, k, nk=nk: (k + nk, i, j),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((n_out, t1, t2), lambda i, j, k: (0, i, j),
                          memory_space=pltpu.VMEM)
    pm_spec = pl.BlockSpec((h, kbp), lambda i, j, k: (0, k),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_x_parity_gradsub3_kernel, terms=terms,
                             nk=nk, h=h)
    nparts = max(terms, 1)

    def fn(pzy, dpdy, dpdz, u, v, w):
        ny, nz = u.shape[1], u.shape[2]
        if ny % t1 or nz % t2 or ny < t1 or nz < t2:
            raise ValueError(f"x-gradsub3 tiling ({t1},{t2}) cannot "
                             f"cover ({ny},{nz})")
        grid = (ny // t1, nz // t2, nk)
        specs = [ze_spec, zo_spec] * 3 + [s_spec] * 3 \
            + [pm_spec] * (4 * nparts)
        return pl.pallas_call(
            kern, grid=grid, in_specs=specs, out_specs=[s_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((n_out, ny, nz),
                                            u.dtype)] * 3,
            interpret=interpret,
            compiler_params=VMEM_LIMIT,
        )(pzy, pzy, dpdy, dpdy, dpdz, dpdz, u, v, w,
          *me_s, *mo_s, *me_i, *mo_i)

    return fn


def make_x_apply(M64, terms=2, sub=False, t1=8, t2=128, kb=256,
                 interpret=False, parity=None):
    """Build fn(f[, s]) applying the dense (n_out, n_in) matrix along
    axis 0 of a 3-D field (full-x tiles, grid over y/z and K blocks),
    optionally fused with the correction `s - M @ f`.

    parity='fwd'|'inv' runs the half-flop parity split of
    parity_split_folded (periodic x): 'fwd' consumes natural physical
    input and emits block-parity-ordered spectral modes; 'inv' consumes
    block-parity modes and emits natural physical output. Raises
    ValueError when the matrix lacks the symmetry."""
    n_out, n_in = M64.shape
    if parity is not None:
        if n_in % 2 or n_out % 2:
            raise ValueError("parity x-apply needs even extents")
        Me, Mo = parity_split_folded(np.asarray(M64, np.float64),
                                     0 if parity == "fwd" else 1)
        h_in = n_in // 2
        ho = n_out // 2
        kbp = _kblock(h_in, kb)
        if kbp < 8:
            kbp = h_in
        nk = h_in // kbp
        me = [jnp.asarray(p) for p in split_hi_lo(Me, terms)]
        mo = [jnp.asarray(p) for p in split_hi_lo(Mo, terms)]
        fa_spec = pl.BlockSpec((kbp, t1, t2), lambda i, j, k: (k, i, j),
                               memory_space=pltpu.VMEM)
        fb_spec = pl.BlockSpec((kbp, t1, t2),
                               lambda i, j, k, nk=nk: (k + nk, i, j),
                               memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((n_out, t1, t2), lambda i, j, k: (0, i, j),
                              memory_space=pltpu.VMEM)
        pm_spec = pl.BlockSpec((ho, kbp), lambda i, j, k: (0, k),
                               memory_space=pltpu.VMEM)
        if parity == "fwd":
            if sub:
                raise ValueError("sub is an inverse-stage fusion")
            kern = functools.partial(_x_parity_fwd_kernel, terms=terms,
                                     nk=nk, ho=ho)
        else:
            kern = functools.partial(_x_parity_inv_kernel, terms=terms,
                                     sub=sub, nk=nk, h=ho)

        def fn(f, s=None):
            ny, nz = f.shape[1], f.shape[2]
            if ny % t1 or nz % t2 or ny < t1 or nz < t2:
                raise ValueError(f"x-apply tiling ({t1},{t2}) cannot "
                                 f"cover ({ny},{nz})")
            grid = (ny // t1, nz // t2, nk)
            args = (f, f, s) if sub else (f, f)
            specs = [fa_spec, fb_spec] + ([s_spec] if sub else []) \
                + [pm_spec] * (2 * len(me))
            return pl.pallas_call(
                kern, grid=grid, in_specs=specs, out_specs=s_spec,
                out_shape=jax.ShapeDtypeStruct((n_out, ny, nz), f.dtype),
                interpret=interpret,
                compiler_params=VMEM_LIMIT,
            )(*args, *me, *mo)

        return fn
    kb = _kblock(n_in, kb)
    if kb < 8:
        # an n_in-step K grid is pathological (per-step DMA overhead
        # dwarfs the dot): run the contraction as ONE full-K block
        # instead (odd extents are small in practice — Dirichlet/Neumann
        # cell axes — so the unpipelined K fits VMEM comfortably)
        kb = n_in
    nk = n_in // kb
    parts = [jnp.asarray(p) for p in split_hi_lo(M64, terms)]
    in_spec = pl.BlockSpec((kb, t1, t2), lambda i, j, k: (k, i, j),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((n_out, t1, t2), lambda i, j, k: (0, i, j),
                          memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n_out, kb), lambda i, j, k: (0, k),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_x_apply_kernel, terms=terms, sub=sub, nk=nk)

    def fn(f, s=None):
        ny, nz = f.shape[1], f.shape[2]
        if ny % t1 or nz % t2 or ny < t1 or nz < t2:
            # a non-dividing extent would silently drop grid iterations
            # and return uninitialised output blocks
            raise ValueError(f"x-apply tiling ({t1},{t2}) cannot cover "
                             f"({ny},{nz})")
        grid = (ny // t1, nz // t2, nk)
        args = (f, s) if sub else (f,)
        specs = ([in_spec, s_spec] if sub else [in_spec]) \
            + [mat_spec] * len(parts)
        return pl.pallas_call(
            kern, grid=grid, in_specs=specs, out_specs=s_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, ny, nz), f.dtype),
            interpret=interpret,
            compiler_params=VMEM_LIMIT,
        )(*args, *parts)

    return fn


# ---------------------------------------------------------------------------
# 3-stage projection pipeline (round 4): slab A (div y/z) -> x kernel B
# (forward x + spectral solve + inverse x, all in VMEM) -> slab C
# (grad z/y + fused velocity correction).
#
# vs the x-first chain (div3 -> mid -> gradsub3, 21 HBM passes), the
# transpose boundaries carry TWO fields each instead of three and the
# spectral solution q never touches HBM:
#
#   A: u, v, w          -> a = Ty Iz Iy u,  e = Ty (Iz Sy v + Sz Iy w)
#   B: a, e             -> X = Gxs q,  Y = Gxi q,   q = -(Sx a + Ix e)/waves
#   C: X, Y, u, v, w    -> u - Gyi Gzi X,  v - Gys Gzi Y,  w - Gyi Gzs Y
#
# 17 passes total (3r+2w, 2r+2w, 5r+3w) and two fewer x-stage parity
# applies (B does 4; the x-first chain needs 6). Only the full fast path
# is supported (banded+butterfly y, parity z and x, no stretching) —
# exactly the production 512^3 configuration; everything else keeps the
# mid-kernel chain. Matches the projection pipeline of
# /root/reference/src/solver.f90:693-739.
# ---------------------------------------------------------------------------


def _pipe_a_kernel(*refs, terms, nb, bs, w):
    """refs: u, v, w planes + [biy, bsy, te, to, ize, izo, sze, szo]
    parts + outs a, e."""
    nparts = max(terms, 1)
    u_ref, v_ref, w_ref = refs[:3]
    m = refs[3:3 + 8 * nparts]
    biy = m[0:nparts]
    bsy = m[nparts:2 * nparts]
    te = m[2 * nparts:3 * nparts]
    to = m[3 * nparts:4 * nparts]
    ize = m[4 * nparts:5 * nparts]
    izo = m[5 * nparts:6 * nparts]
    sze = m[6 * nparts:7 * nparts]
    szo = m[7 * nparts:8 * nparts]
    a_ref, e_ref = refs[3 + 8 * nparts:]
    p1 = _banded_left(biy, u_ref[0], nb, bs, w, terms)
    p2 = _banded_left(bsy, v_ref[0], nb, bs, w, terms)
    p3 = _banded_left(biy, w_ref[0], nb, bs, w, terms)
    z1 = _psplit_right(p1, ize, izo, terms)
    z2 = _psplit_right(p2, ize, izo, terms)
    z3 = _psplit_right(p3, sze, szo, terms)
    a = _bfly_fwd(te, to, z1, terms)
    e = _bfly_fwd(te, to, z2 + z3, terms)
    a_ref[0] = a.astype(a_ref.dtype)
    e_ref[0] = e.astype(e_ref.dtype)


def _pipe_b_kernel(*refs, terms, h):
    """refs: a half-streams (fa, fb), e half-streams + fwd parity parts
    (me_sx, mo_sx, me_ix, mo_ix) + inv parity parts (me_gs, mo_gs,
    me_gi, mo_gi) + table tiles (A, B, Myz) + x-mode columns (k2x, tx2,
    mx as (nx, 1)) + outs X, Y. One grid step per (y, z) tile: the full
    x extent is resident, so forward transform, solve and both inverse
    transforms happen without q ever reaching HBM."""
    nparts = max(terms, 1)
    fa_a, fb_a, fa_e, fb_e = refs[:4]
    m = refs[4:4 + 8 * nparts]
    me_sx = m[0:nparts]
    mo_sx = m[nparts:2 * nparts]
    me_ix = m[2 * nparts:3 * nparts]
    mo_ix = m[3 * nparts:4 * nparts]
    me_gs = m[4 * nparts:5 * nparts]
    mo_gs = m[5 * nparts:6 * nparts]
    me_gi = m[6 * nparts:7 * nparts]
    mo_gi = m[7 * nparts:8 * nparts]
    A_ref, B_ref, Myz_ref, k2x_ref, tx2_ref, mx_ref = \
        refs[4 + 8 * nparts:4 + 8 * nparts + 6]
    X_ref, Y_ref = refs[4 + 8 * nparts + 6:]
    aa, ab = fa_a[...], fb_a[...]
    ea, eb = fa_e[...], fb_e[...]
    sh = aa.shape
    t12 = sh[1] * sh[2]
    sa = (aa + ab).reshape(h, t12)
    da = (aa - ab).reshape(h, t12)
    se = (ea + eb).reshape(h, t12)
    de = (ea - eb).reshape(h, t12)
    Fe = _mm_left(me_sx, sa, terms) + _mm_left(me_ix, se, terms)
    Fo = _mm_left(mo_sx, da, terms) + _mm_left(mo_ix, de, terms)
    F = jnp.concatenate([Fe, Fo], axis=0)           # (nx, t12)
    At = A_ref[...].reshape(1, t12)
    Bt = B_ref[...].reshape(1, t12)
    Mt = Myz_ref[...].reshape(1, t12)
    waves = k2x_ref[...] * At + tx2_ref[...] * Bt   # (nx, t12)
    ok = jnp.abs(waves) >= _EPS
    inv = jnp.where(ok, -1.0 / jnp.where(ok, waves, 1.0), 0.0)
    q = F * inv * (1.0 - mx_ref[...] * Mt)
    qe, qo = q[:h], q[h:]
    Xa = _mm_left(me_gs, qe, terms)
    Xb = _mm_left(mo_gs, qo, terms)
    X = jnp.concatenate([Xa + Xb, Xa - Xb], axis=0)
    Ya = _mm_left(me_gi, qe, terms)
    Yb = _mm_left(mo_gi, qo, terms)
    Y = jnp.concatenate([Ya + Yb, Ya - Yb], axis=0)
    X_ref[...] = X.reshape((2 * h,) + sh[1:]).astype(X_ref.dtype)
    Y_ref[...] = Y.reshape((2 * h,) + sh[1:]).astype(Y_ref.dtype)


def _pipe_c_kernel(*refs, terms, nvz, nb, bs, w, d2=False, nu=0.0,
                   zbs=128, zw=64):
    """refs: X, Y planes + u, v, w planes + [gie, gio (gz_i inv parity),
    GE, GO (stacked gz_is inv parity), tet, tot, wvec, bgiy, bgsy] parts
    [+ z-sweep stacks sa2, st2, da2, dt2 when d2] + outs un, vn, wn
    [+ the next step's d2-sweep RHS partials r_u, r_v, r_w when d2].

    With d2, the kernel ALSO evaluates the NEXT step's z-direction
    transeq sweep on the just-corrected velocities: the slab holds the
    full z extent (it is the lane axis), so the windowed lane sweep of
    _pencil_kernel runs in place and the separate d2 kernel's three
    full-field reads vanish from the step (the AB chain then starts at
    the accumulated d0 with acc = these carried partials)."""
    nparts = max(terms, 1)
    X_ref, Y_ref = refs[:2]
    u_ref, v_ref, w_ref = refs[2:5]
    m = refs[5:5 + 8 * nparts + 1]
    gie = m[0:nparts]
    gio = m[nparts:2 * nparts]
    GE = m[2 * nparts:3 * nparts]
    GO = m[3 * nparts:4 * nparts]
    tet = m[4 * nparts:5 * nparts]
    tot = m[5 * nparts:6 * nparts]
    bgiy = m[6 * nparts:7 * nparts]
    bgsy = m[7 * nparts:8 * nparts]
    wv_ref = m[8 * nparts]
    i = 5 + 8 * nparts + 1
    if d2:
        zm = refs[i:i + 4 * nparts]
        sa2 = zm[0:nparts]
        st2 = zm[nparts:2 * nparts]
        da2 = zm[2 * nparts:3 * nparts]
        dt2 = zm[3 * nparts:4 * nparts]
        i += 4 * nparts
    outs = refs[i:]
    X = X_ref[0]
    Y = Y_ref[0]
    h = X.shape[1] // 2
    dn = (((1,), (1,)), ((), ()))
    # z stages (inverse parity): px = Gzi X; (pzY | dzY) = (Gzi | Gzs) Y
    pxa = _dot_split(_split(X[:, :h], terms),
                     tuple(r[...] for r in gie), dn)
    pxb = _dot_split(_split(X[:, h:], terms),
                     tuple(r[...] for r in gio), dn)
    px = jnp.concatenate([pxa + pxb, pxa - pxb], axis=1)  # (ny, nvz)
    A2 = _dot_split(_split(Y[:, :h], terms),
                    tuple(r[...] for r in GE), dn)        # (ny, 2hz)
    B2 = _dot_split(_split(Y[:, h:], terms),
                    tuple(r[...] for r in GO), dn)
    hz = nvz // 2
    ai, as_ = A2[:, :hz], A2[:, hz:]
    bi, bs_ = B2[:, :hz], B2[:, hz:]
    pzY = jnp.concatenate([ai + bi, ai - bi], axis=1)     # Gzi Y
    dzY = jnp.concatenate([as_ + bs_, as_ - bs_], axis=1)  # Gzs Y
    # one wide inverse y butterfly over [Gzi X | Gzs Y | Gzi Y]: the
    # first two thirds feed the SHARED banded Giy, the last third Gsy
    wide = jnp.concatenate([px, dzY, pzY], axis=1)        # (ny, 3nvz)
    GH = _bfly_inv(tet, tot, wv_ref, wide, terms)
    both = _banded_left(bgiy, GH[:, :2 * nvz], nb, bs, w, terms)
    dpdx = both[:, :nvz]
    dpdz = both[:, nvz:]
    dpdy = _banded_left(bgsy, GH[:, 2 * nvz:], nb, bs, w, terms)
    un = u_ref[0] - dpdx
    vn = v_ref[0] - dpdy
    wn = w_ref[0] - dpdz
    outs[0][0] = un.astype(outs[0].dtype)
    outs[1][0] = vn.astype(outs[1].dtype)
    outs[2][0] = wn.astype(outs[2].dtype)
    if d2:
        # next step's z sweep on the corrected slab (lane-axis windowed
        # banded sweep, _pencil_kernel math on a resident plane)
        n = un.shape[1]
        nbz = n // zbs
        conv_ext = jnp.concatenate([wn[:, n - zw:], wn, wn[:, :zw]],
                                   axis=1)
        prec = (jax.lax.Precision.HIGHEST if terms == 0
                else jax.lax.Precision.DEFAULT)
        dn2 = (((1,), (1,)), ((), ()))
        for c, q in enumerate((un, vn, wn)):
            ext = jnp.concatenate([q[:, n - zw:], q, q[:, :zw]], axis=1)
            qs = _split(ext, terms)
            ps = _split(ext * conv_ext, terms)
            S, D = ((sa2, da2) if c == 2 else (st2, dt2))
            blocks = []
            for b in range(nbz):
                sl = slice(b * zbs, b * zbs + zbs + 2 * zw)
                Sb = tuple(M[b] for M in S)
                Db = tuple(M[b] for M in D)
                stacked = _dot_split(tuple(x[:, sl] for x in qs), Sb,
                                     dn2, prec)
                dq = stacked[:, :zbs]
                d2q = stacked[:, zbs:]
                dqd = _dot_split(tuple(x[:, sl] for x in ps), Db, dn2,
                                 prec)
                conv = wn[:, b * zbs:(b + 1) * zbs]
                blocks.append(-0.5 * (conv * dq + dqd) + nu * d2q)
            r = jnp.concatenate(blocks, axis=1)
            outs[3 + c][0] = r.astype(outs[3 + c].dtype)


def pipe3_supported(ns, terms=3) -> bool:
    """The 3-stage pipeline serves exactly the production fast path:
    slab-supported mesh, all axes periodic-even (banded+butterfly y,
    parity z and x), square operators."""
    from ..common import DataLoc
    if not slab_pressure_supported(ns, terms):
        return False
    po = ns.poisson
    if po.folded:
        return False
    nx, ny, nz = po.nc
    nv = ns.mesh.dims(DataLoc.VERT)
    oy = ns.ops[1]
    return (nv == (nx, ny, nz) and nx % 16 == 0 and ny % 16 == 0
            and nz % 16 == 0 and ny % 64 == 0
            and oy.interpl_v2p.n_out == oy.interpl_v2p.n_in)


def make_pressure_pipe3(ns, terms=2, t1=8, t2=128, interpret=False,
                        d2_sweep=False):
    """Build fn(u, v, w) -> (u', v', w') — the full keep_pressure=False
    projection as the 3-kernel pipeline described above. Raises
    ValueError when the configuration is outside the fast path."""
    from ..common import DataLoc
    po = ns.poisson
    nx, ny, nz = po.nc
    nvx, nvy, nvz = ns.mesh.dims(DataLoc.VERT)
    if not pipe3_supported(ns, terms):
        raise ValueError("pipe3 needs the periodic-even fast path")
    d64 = ns._fp_mats64()
    oy = ns.ops[1]
    bw = 32 if terms >= 3 else 16
    bbs = 64
    nb = ny // bbs
    bmats = {}
    for key, op in (("iy", oy.interpl_v2p), ("sy", oy.stagder_v2p),
                    ("giy", oy.interpl_p2v), ("gsy", oy.stagder_p2v)):
        bmats[key] = banded_blocks(op, bw, bbs, tol=_BAND_TOL)
    Teb, Tob, wvec = parity_split(ny)
    Ize, Izo = parity_split_folded(d64["iz"], 0)
    Sze, Szo = parity_split_folded(d64["sz"], 0)
    Gie, Gio = parity_split_folded(d64["gz_i"], 1)
    Gse, Gso = parity_split_folded(d64["gz_s"], 1)
    # stacked rows: (Gzi | Gzs) halves of Y in one dot (_grad_body bfz)
    GEm = np.concatenate([Gie, Gse], axis=0)
    GOm = np.concatenate([Gio, Gso], axis=0)
    SxE, SxO = parity_split_folded(d64["sx"], 0)
    IxE, IxO = parity_split_folded(d64["ix"], 0)
    GsE, GsO = parity_split_folded(d64["gx_s"], 1)
    GiE, GiO = parity_split_folded(d64["gx_i"], 1)

    def parts(M):
        return [jnp.asarray(p) for p in split_hi_lo(M, terms)]

    # --- kernel A ---------------------------------------------------------
    mA = (parts(bmats["iy"]) + parts(bmats["sy"]) + parts(Teb)
          + parts(Tob) + parts(Ize) + parts(Izo) + parts(Sze)
          + parts(Szo))
    plane = _plane_spec(ny, nz)
    kA = functools.partial(_pipe_a_kernel, terms=terms, nb=nb, bs=bbs,
                           w=bw)
    a_specs = [plane] * 3 + [_const_spec(p.shape) for p in mA]

    def a_fn(u, v, w):
        return pl.pallas_call(
            kA, grid=(nx,), in_specs=a_specs, out_specs=[plane] * 2,
            out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), u.dtype)] * 2,
            interpret=interpret, compiler_params=_cparams(1),
        )(u, v, w, *mA)

    # --- kernel B ---------------------------------------------------------
    # solve tables in the block-parity (x, y, z) mode orderings
    q_perm = np.concatenate([np.arange(0, ny, 2), np.arange(1, ny, 2)])
    z_perm = np.concatenate([np.arange(0, nz, 2), np.arange(1, nz, 2)])
    x_perm = np.concatenate([np.arange(0, nx, 2), np.arange(1, nx, 2)])
    A = np.asarray(po.tab_A, np.float64)[q_perm][:, z_perm]
    B = np.asarray(po.tab_B, np.float64)[q_perm][:, z_perm]
    if po._zero_idx is not None:
        mxv = ((np.arange(nx) == nx // 2).astype(np.float64)
               if 0 in po._zero_idx else np.ones(nx))
        myv = ((np.arange(ny) == ny // 2).astype(np.float64)
               if 1 in po._zero_idx else np.ones(ny))
        mzv = ((np.arange(nz) == nz // 2).astype(np.float64)
               if 2 in po._zero_idx else np.ones(nz))
        Myz = np.outer(myv, mzv)[q_perm][:, z_perm]
    else:
        mxv = np.zeros(nx)
        Myz = np.zeros((ny, nz))
    k2x = po.k2_1d[0][x_perm]
    tx2 = (po.T_1d[0] ** 2)[x_perm]
    mxv = mxv[x_perm]
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    tabs_dev = [f32(A), f32(B), f32(Myz), f32(k2x.reshape(nx, 1)),
                f32(tx2.reshape(nx, 1)), f32(mxv.reshape(nx, 1))]
    mB = (parts(SxE) + parts(SxO) + parts(IxE) + parts(IxO)
          + parts(GsE) + parts(GsO) + parts(GiE) + parts(GiO))
    h = nx // 2
    fa_spec = pl.BlockSpec((h, t1, t2), lambda i, j: (0, i, j),
                           memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((h, t1, t2), lambda i, j: (1, i, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((nx, t1, t2), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((t1, t2), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((nx, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    kB = functools.partial(_pipe_b_kernel, terms=terms, h=h)
    b_specs = ([fa_spec, fb_spec] * 2
               + [_const_spec(p.shape) for p in mB]
               + [tile_spec] * 3 + [col_spec] * 3)

    def b_fn(a, e):
        grid = (ny // t1, nz // t2)
        return pl.pallas_call(
            kB, grid=grid, in_specs=b_specs, out_specs=[out_spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), a.dtype)] * 2,
            interpret=interpret, compiler_params=_cparams(2),
        )(a, a, e, e, *mB, *tabs_dev)

    # --- kernel C ---------------------------------------------------------
    w_perm = np.concatenate([wvec[0::2], wvec[1::2]])
    mC = (parts(Gie) + parts(Gio) + parts(GEm) + parts(GOm)
          + parts(Teb.T) + parts(Tob.T) + parts(bmats["giy"])
          + parts(bmats["gsy"])
          + [jnp.asarray(w_perm.reshape(ny, 1), jnp.float32)])
    mC2 = []
    zbs, zw = 128, 64
    if d2_sweep:
        from .pallas_kernels import _stack_banded
        if nz % zbs or nz < zbs + 2 * zw:
            raise ValueError("d2-in-C needs a lane-tileable z extent")
        oz = ns.ops[2]
        sa2 = _stack_banded((oz.der1st, oz.der2nd), zw, zbs)
        st2 = _stack_banded((oz.der1st_sym, oz.der2nd_sym), zw, zbs)
        da2 = banded_blocks(oz.der1st_sym, zw, zbs, tol=_BAND_TOL)
        dt2 = banded_blocks(oz.der1st, zw, zbs, tol=_BAND_TOL)
        for M in (sa2, st2, da2, dt2):
            mC2 += parts(M)
    n_out_c = 6 if d2_sweep else 3
    kC = functools.partial(_pipe_c_kernel, terms=terms, nvz=nvz, nb=nb,
                           bs=bbs, w=bw, d2=d2_sweep,
                           nu=float(ns.nu), zbs=zbs, zw=zw)
    c_specs = [plane] * 2 + [plane] * 3 \
        + [_const_spec(np.asarray(p).shape) for p in mC] \
        + [_const_spec(np.asarray(p).shape) for p in mC2]

    def c_fn(X, Y, u, v, w):
        outs = pl.pallas_call(
            kC, grid=(nx,), in_specs=c_specs,
            out_specs=[plane] * n_out_c,
            out_shape=[jax.ShapeDtypeStruct((nx, ny, nz),
                                            u.dtype)] * n_out_c,
            interpret=interpret, compiler_params=_cparams(1),
        )(X, Y, u, v, w, *mC, *mC2)
        return outs

    def fn(u, v, w):
        a, e = a_fn(u, v, w)
        X, Y = b_fn(a, e)
        outs = c_fn(X, Y, u, v, w)
        if d2_sweep:
            return tuple(outs[:3]), tuple(outs[3:])
        return tuple(outs)

    fn.a_fn, fn.b_fn, fn.c_fn = a_fn, b_fn, c_fn
    fn.d2_sweep = d2_sweep
    return fn
