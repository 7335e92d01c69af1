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


@pytest.mark.parametrize("stretching", ["top-bottom", "centred"])
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


def test_bottom_stretching_uses_cg():
    """'bottom' stretching routes to the CG Poisson solver (the
    reference's spectral 'bottom' path is untested upstream and our
    transcription fails the roundtrip; CG solves it to 3e-12) and the
    resulting solver passes the div(grad) roundtrip."""
    from x3d2_tpu.ops.cg_poisson import CGPoisson
    with pytest.warns(UserWarning, match="bottom"):
        mesh, ns = make("bottom")
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
    with pytest.warns(UserWarning, match="bottom"):
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
