"""Vector calculus verification vs analytic fields (curl, laplacian,
divergence+gradient at scheme accuracy) - reference vector_calculus.f90
coverage."""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC, DataLoc
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes


@pytest.fixture(scope="module")
def periodic_ns():
    n = 64
    mesh = Mesh((n, n, n), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    return mesh, NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64)


def test_curl_analytic(periodic_ns):
    mesh, ns = periodic_ns
    X, Y, Z = mesh.coord_grids(DataLoc.VERT)
    # TGV-like field: curl has closed form
    u = np.sin(X) * np.cos(Y) * np.cos(Z) + 0 * (Y + Z)
    v = -np.cos(X) * np.sin(Y) * np.cos(Z) + 0 * (X + Z)
    w = np.zeros(mesh.dims(DataLoc.VERT))
    u = np.broadcast_to(u, w.shape)
    v = np.broadcast_to(v, w.shape)
    ci, cj, ck = (np.asarray(q) for q in
                  ns.curl(jnp.asarray(u), jnp.asarray(v), jnp.asarray(w)))
    ci_ref = -np.cos(X) * np.sin(Y) * np.sin(Z)  # -dv/dz
    cj_ref = -np.sin(X) * np.cos(Y) * np.sin(Z)  # du/dz
    ck_ref = 2 * np.sin(X) * np.sin(Y) * np.cos(Z)  # dv/dx - du/dy
    assert np.max(np.abs(ci - ci_ref)) < 1e-8
    assert np.max(np.abs(cj - cj_ref)) < 1e-8
    assert np.max(np.abs(ck - ck_ref)) < 1e-8


def test_laplacian_analytic(periodic_ns):
    mesh, ns = periodic_ns
    X, Y, Z = mesh.coord_grids(DataLoc.VERT)
    f = np.sin(X) * np.cos(2 * Y) * np.sin(Z)
    f = np.broadcast_to(f, mesh.dims(DataLoc.VERT))
    lap = np.asarray(ns.laplacian(jnp.asarray(f)))
    assert np.max(np.abs(lap + 6.0 * f)) < 1e-6


def test_divergence_of_solenoidal_field(periodic_ns):
    mesh, ns = periodic_ns
    X, Y, Z = mesh.coord_grids(DataLoc.VERT)
    # TGV IC is divergence-free
    u = np.broadcast_to(np.sin(X) * np.cos(Y) * np.cos(Z),
                        mesh.dims(DataLoc.VERT))
    v = np.broadcast_to(-np.cos(X) * np.sin(Y) * np.cos(Z), u.shape)
    w = np.zeros_like(u)
    div = np.asarray(ns.divergence_v2p(jnp.asarray(u), jnp.asarray(v),
                                       jnp.asarray(w)))
    assert np.max(np.abs(div)) < 1e-9


def test_gradient_of_cosine(periodic_ns):
    mesh, ns = periodic_ns
    Xc, Yc, Zc = mesh.coord_grids(DataLoc.CELL)
    Xv, Yv, Zv = mesh.coord_grids(DataLoc.VERT)
    p = np.broadcast_to(np.cos(Xc) * np.cos(Yc) * np.cos(Zc),
                        mesh.dims(DataLoc.CELL))
    gx, gy, gz = (np.asarray(q) for q in ns.gradient_p2v(jnp.asarray(p)))
    assert np.max(np.abs(gx + np.sin(Xv) * np.cos(Yv) * np.cos(Zv))) < 1e-8
    assert np.max(np.abs(gy + np.cos(Xv) * np.sin(Yv) * np.cos(Zv))) < 1e-8
    assert np.max(np.abs(gz + np.cos(Xv) * np.cos(Yv) * np.sin(Zv))) < 1e-8


def test_transeq_analytic_convection_diffusion(periodic_ns):
    """Full transeq vs the analytic RHS for the TGV initial field
    (reference test_omp_transeq analogue): check against a high-resolution
    spectral evaluation of -1/2(u.grad u + grad.(uu)) + nu lap(u)."""
    mesh, ns = periodic_ns
    X, Y, Z = mesh.coord_grids(DataLoc.VERT)
    shape = mesh.dims(DataLoc.VERT)
    u = np.broadcast_to(np.sin(X) * np.cos(Y) * np.cos(Z), shape)
    v = np.broadcast_to(-np.cos(X) * np.sin(Y) * np.cos(Z), shape)
    w = np.zeros(shape)
    du, dv, dw = (np.asarray(q) for q in
                  ns.transeq(jnp.asarray(u), jnp.asarray(v), jnp.asarray(w)))
    nu = ns.nu
    # analytic: conv_u = u du/dx + v du/dy + w du/dz (divergence-free =>
    # skew-symmetric form equals advective form)
    dudx = np.cos(X) * np.cos(Y) * np.cos(Z)
    dudy = -np.sin(X) * np.sin(Y) * np.cos(Z)
    dudz = -np.sin(X) * np.cos(Y) * np.sin(Z)
    conv_u = u * dudx + v * dudy + w * dudz
    rhs_u_ref = -conv_u + nu * (-3 * u)
    assert np.max(np.abs(du - rhs_u_ref)) < 1e-7
    dvdx = np.sin(X) * np.sin(Y) * np.cos(Z)
    dvdy = -np.cos(X) * np.cos(Y) * np.cos(Z)
    dvdz = np.cos(X) * np.sin(Y) * np.sin(Z)
    conv_v = u * dvdx + v * dvdy + w * dvdz
    rhs_v_ref = -conv_v + nu * (-3 * v)
    assert np.max(np.abs(dv - rhs_v_ref)) < 1e-7
    assert np.max(np.abs(dw)) < 1e-7


def test_transeq_species_analytic(periodic_ns):
    """Species RHS vs the analytic convection-diffusion of a cosine
    scalar in the TGV velocity field (reference
    tests/verification/test_omp_transeq_species ethos; semantics from
    solver.f90:507-601). The velocity is divergence-free, so the
    skew-symmetric form equals -u.grad(phi) + nu_s lap(phi)."""
    mesh, ns = periodic_ns
    X, Y, Z = mesh.coord_grids(DataLoc.VERT)
    shape = mesh.dims(DataLoc.VERT)
    u = np.broadcast_to(np.sin(X) * np.cos(Y) * np.cos(Z), shape)
    v = np.broadcast_to(-np.cos(X) * np.sin(Y) * np.cos(Z), shape)
    w = np.zeros(shape)
    phi = np.broadcast_to(np.cos(X) * np.cos(Y) * np.cos(Z), shape)
    nu_s = 0.37
    got = np.asarray(ns.transeq_species(
        jnp.asarray(phi), jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
        nu_s))
    dpdx = -np.sin(X) * np.cos(Y) * np.cos(Z)
    dpdy = -np.cos(X) * np.sin(Y) * np.cos(Z)
    dpdz = -np.cos(X) * np.cos(Y) * np.sin(Z)
    ref = -(u * dpdx + v * dpdy + w * dpdz) + nu_s * (-3 * phi)
    assert np.max(np.abs(got - ref)) < 1e-7
