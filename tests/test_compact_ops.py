"""Verification of compact-scheme operators vs analytic derivatives.

Mirrors the reference's tests/verification/test_omp_tridiag.f90 and
test_thom.f90: sin/cos fields on matched domains, L2(rms) tolerance 1e-8
at n=1024 in float64 (test_omp_tridiag.f90:40).
"""

import numpy as np
import pytest

from x3d2_tpu.common import BC
from x3d2_tpu.ops import build_op
from x3d2_tpu.ops.compact import apply_matrix

import jax.numpy as jnp

N = 1024
TOL = 1e-8


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, dtype=np.float64) ** 2)))


def _grid(bc, staggered_out=False):
    """Return (x_in, x_out, dx) matching the reference test geometry."""
    if bc == BC.PERIODIC:
        dx = 2 * np.pi / N
        x = np.arange(N) * dx
        xs = x + dx / 2
        return x, (xs if staggered_out else x), dx
    # non-periodic on [0, pi]: endpoints align with the boundary
    dx = np.pi / (N - 1)
    x = np.arange(N) * dx
    xs = x[:-1] + dx / 2
    return x, (xs if staggered_out else x), dx


def case_der1(bc, sym):
    x, _, dx = _grid(bc)
    if bc == BC.PERIODIC or not sym:
        u, du = np.sin(x), np.cos(x)  # odd at 0, pi
    else:
        u, du = np.cos(x), -np.sin(x)  # even at 0, pi
    return x, dx, u, du


@pytest.mark.parametrize("bc,sym", [
    (BC.PERIODIC, False),
    (BC.NEUMANN, False),
    (BC.NEUMANN, True),
    (BC.DIRICHLET, False),
])
def test_deriv_1st_compact6(bc, sym):
    x, dx, u, du_ref = case_der1(bc, sym)
    op = build_op("first-deriv", N, dx, "compact6", bc, bc, sym=sym,
                  dtype=jnp.float64)
    du = np.asarray(op.M64 @ u)
    assert rms(du - du_ref) < TOL


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.NEUMANN])
def test_deriv_1st_compact10_penta(bc):
    x, dx, u, du_ref = case_der1(bc, sym=False)
    op = build_op("first-deriv", N, dx, "compact10_penta", bc, bc,
                  dtype=jnp.float64)
    du = np.asarray(op.M64 @ u)
    assert rms(du - du_ref) < TOL


def test_deriv_1st_compact10_penta_dirichlet():
    """Dirichlet penta closure uses zero ghosts + 4th-order one-sided rows,
    exact only for fields vanishing to high order at the wall. Mirror the
    reference's convergence test (test_omp_penta.f90:47-48): f=sin^3(pi*x),
    require rate >= 4."""
    errs, errs_int = [], []
    for n in (32, 64, 128):
        dx = 1.0 / (n - 1)
        x = np.arange(n) * dx
        u = np.sin(np.pi * x) ** 3
        du_ref = 3 * np.pi * np.sin(np.pi * x) ** 2 * np.cos(np.pi * x)
        op = build_op("first-deriv", n, dx, "compact10_penta", BC.DIRICHLET,
                      BC.DIRICHLET, dtype=jnp.float64)
        err = np.asarray(op.M64 @ u) - du_ref
        errs.append(rms(err))
        errs_int.append(rms(err[4:-4]))
    rate = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert min(rate) >= 4.0, (errs, rate)
    # interior rows are 10th-order: near-exact at n=128 (residual is
    # boundary error diffused inward through the implicit LHS)
    assert errs_int[-1] < 1e-6, errs_int


def test_deriv_1st_compact10_penta_neumann_sym():
    x, dx, u, du_ref = case_der1(BC.NEUMANN, sym=True)
    op = build_op("first-deriv", N, dx, "compact10_penta", BC.NEUMANN,
                  BC.NEUMANN, sym=True, dtype=jnp.float64)
    du = np.asarray(op.M64 @ u)
    assert rms(du - du_ref) < TOL


@pytest.mark.parametrize("bc,sym", [
    (BC.PERIODIC, False),
    (BC.NEUMANN, False),
    (BC.NEUMANN, True),
    (BC.DIRICHLET, False),
])
def test_deriv_2nd_compact6(bc, sym):
    x, dx, u, _ = case_der1(bc, sym)
    op = build_op("second-deriv", N, dx, "compact6", bc, bc, sym=sym,
                  dtype=jnp.float64)
    d2u = np.asarray(op.M64 @ u)
    assert rms(d2u + u) < TOL  # d2(sin)=-sin, d2(cos)=-cos


def test_deriv_2nd_hyperviscous_periodic():
    # Hyperviscous scheme: 2nd-order accurate with controlled spectral
    # over-dissipation; just check it reproduces -sin to scheme accuracy.
    dx = 2 * np.pi / N
    x = np.arange(N) * dx
    op = build_op("second-deriv", N, dx, "compact6-hyperviscous",
                  BC.PERIODIC, BC.PERIODIC, c_nu=0.44, nu0_nu=63.0,
                  dtype=jnp.float64)
    d2u = np.asarray(op.M64 @ np.sin(x))
    # low-wavenumber field => near-exact even for the modified scheme
    assert rms(d2u + np.sin(x)) < 1e-5


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.NEUMANN])
def test_stagder_v2p(bc):
    x, xs, dx = _grid(bc, staggered_out=True)
    if bc == BC.PERIODIC:
        n_out, u, du_ref = N, np.sin(x), np.cos(xs)
    else:
        # v2p: input on N verts, output on N-1 midpoints.
        # stagder v2p Neumann closure assumes an antisymmetric (sin-type)
        # field (tdsops.f90:824-832 'sym is always .false.')
        n_out, u, du_ref = N - 1, np.sin(x), np.cos(xs)
    op = build_op("stag-deriv", n_out, dx, "compact6", bc, bc, from_to="v2p",
                  dtype=jnp.float64)
    assert op.n_in == u.shape[0]
    du = np.asarray(op.M64 @ u)
    assert rms(du - du_ref) < TOL


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.NEUMANN])
def test_stagder_p2v(bc):
    x, xs, dx = _grid(bc, staggered_out=True)
    if bc == BC.PERIODIC:
        # input at midpoints, output at verts
        u, du_ref = np.sin(xs), np.cos(x)
    else:
        # p2v Neumann closure assumes symmetric (cos-type) field
        # (tdsops.f90:833-840 'sym is always .true.')
        u, du_ref = np.cos(xs), -np.sin(x)
    op = build_op("stag-deriv", N, dx, "compact6", bc, bc, from_to="p2v",
                  dtype=jnp.float64)
    assert op.n_in == u.shape[0]
    du = np.asarray(op.M64 @ u)
    assert rms(du - du_ref) < TOL


@pytest.mark.parametrize("scheme", ["classic", "optimised", "aggressive"])
@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.NEUMANN])
def test_interp_v2p(scheme, bc):
    x, xs, dx = _grid(bc, staggered_out=True)
    if bc == BC.PERIODIC:
        n_out, u, ui_ref = N, np.sin(x), np.sin(xs)
    else:
        # interp v2p Neumann closure: symmetric field (tdsops.f90:691-702)
        n_out, u, ui_ref = N - 1, np.cos(x), np.cos(xs)
    op = build_op("interpolate", n_out, dx, scheme, bc, bc, from_to="v2p",
                  dtype=jnp.float64)
    ui = np.asarray(op.M64 @ u)
    assert rms(ui - ui_ref) < TOL


@pytest.mark.parametrize("scheme", ["classic", "optimised", "aggressive"])
@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.NEUMANN])
def test_interp_p2v(scheme, bc):
    x, xs, dx = _grid(bc, staggered_out=True)
    if bc == BC.PERIODIC:
        u, ui_ref = np.sin(xs), np.sin(x)
    else:
        u, ui_ref = np.cos(xs), np.cos(x)
    op = build_op("interpolate", N, dx, scheme, bc, bc, from_to="p2v",
                  dtype=jnp.float64)
    ui = np.asarray(op.M64 @ u)
    assert rms(ui - ui_ref) < TOL


def test_apply_along_each_axis():
    """3-D application along x, y, z axes must match the 1-D operator."""
    n = 64
    dx = 2 * np.pi / n
    op = build_op("first-deriv", n, dx, "compact6", BC.PERIODIC, BC.PERIODIC,
                  dtype=jnp.float64)
    x = np.arange(n) * dx
    rng = np.random.default_rng(0)
    for axis in range(3):
        shape = [5, 6, 7]
        shape[axis] = n
        coords = x.reshape([-1 if a == axis else 1 for a in range(3)])
        f = np.sin(coords) * rng.normal(size=shape[:axis] + [1] + shape[axis + 1:])
        du = np.asarray(apply_matrix(jnp.asarray(op.M64), jnp.asarray(f), axis))
        ref = np.moveaxis(op.M64 @ np.moveaxis(f, axis, 0).reshape(n, -1),
                          0, 0).reshape([n] + [s for i, s in enumerate(shape)
                                               if i != axis])
        ref = np.moveaxis(ref.reshape([n] + [s for i, s in enumerate(shape)
                                             if i != axis]), 0, axis)
        assert np.allclose(du, ref, atol=1e-12)


def test_operator_band_decay():
    """The resolved operator must decay exponentially off the diagonal,
    validating the band-truncated sharded application."""
    n = 256
    dx = 2 * np.pi / n
    for operation, kw in [("first-deriv", {}), ("second-deriv", {}),
                          ("interpolate", dict(from_to="v2p")),
                          ("stag-deriv", dict(from_to="v2p"))]:
        op = build_op(operation, n, dx,
                      "classic" if operation == "interpolate" else "compact6",
                      BC.PERIODIC, BC.PERIODIC, dtype=jnp.float64, **kw)
        M = np.abs(op.M64)
        scale = M.max()
        # entries > 1e-13 should lie within a band of half-width < 48
        for i in range(n):
            nz = np.nonzero(M[i] >= 1e-13 * scale)[0]
            dist = np.minimum(np.abs(nz - i), n - np.abs(nz - i))
            assert dist.max() < 48, f"{operation}: band too wide {dist.max()}"
