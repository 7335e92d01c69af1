"""Preconditioned-CG Poisson solver: must match the spectral solve on
uniform meshes (1 iteration with a perfect preconditioner) and handle
stretched meshes including 'bottom' where the spectral path cannot."""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC, DataLoc
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.solver import NavierStokes


def rhs_field(mesh):
    X, Y, Z = mesh.coord_grids(DataLoc.CELL)
    f = (np.cos(2 * np.pi * X / mesh.L[0])
         * np.cos(np.pi * Y / mesh.L[1])
         * np.cos(2 * np.pi * Z / mesh.L[2]))
    f = np.broadcast_to(f, mesh.dims(DataLoc.CELL)).copy()
    return f - f.mean()


def roundtrip_err(ns, f):
    p = ns.poisson(jnp.asarray(f))
    lap = np.asarray(ns.divergence_v2p(*ns.gradient_p2v(p)))
    err = lap - f
    return np.abs(err - err.mean()).max()


def test_cg_matches_spectral_uniform():
    mesh = Mesh((32, 32, 32), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    ns_cg = NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64,
                               poisson_method="cg")
    ns_sp = NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64)
    f = rhs_field(mesh)
    p1 = np.asarray(ns_cg.poisson(jnp.asarray(f)))
    p2 = np.asarray(ns_sp.poisson(jnp.asarray(f)))
    assert np.abs((p1 - p1.mean()) - (p2 - p2.mean())).max() < 1e-10
    assert roundtrip_err(ns_cg, f) < 1e-9


@pytest.mark.parametrize("stretching", ["top-bottom", "bottom"])
def test_cg_stretched(stretching):
    """CG handles stretchings including 'bottom' (rejected by the
    spectral path)."""
    mesh = Mesh((16, 33, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", stretching, "uniform"),
                beta=(1.0, 0.5, 1.0))
    ns = NavierStokes.build(mesh, nu=1.0, dtype=jnp.float64,
                            poisson_method="cg")
    f = rhs_field(mesh)
    assert roundtrip_err(ns, f) < 1e-8
