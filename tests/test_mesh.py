"""Mesh unit tests (reference tests/unit/test_mesh.f90 analogue):
dims per staggered data location, BC validation, coordinates."""

import numpy as np
import pytest

from x3d2_tpu.common import BC, DataLoc
from x3d2_tpu.mesh import Mesh


def test_dims_periodic():
    m = Mesh((16, 24, 32), (1.0, 2.0, 3.0), ((BC.PERIODIC, BC.PERIODIC),) * 3)
    assert m.global_vert_dims == (16, 24, 32)
    assert m.global_cell_dims == (16, 24, 32)
    assert m.dims(DataLoc.VERT) == (16, 24, 32)
    assert m.dims(DataLoc.CELL) == (16, 24, 32)
    assert np.isclose(m.d[1], 2.0 / 24)


def test_dims_nonperiodic():
    m = Mesh((17, 25, 32), (1.0, 2.0, 3.0),
             ((BC.DIRICHLET, BC.DIRICHLET),
              (BC.NEUMANN, BC.NEUMANN),
              (BC.PERIODIC, BC.PERIODIC)))
    assert m.global_cell_dims == (16, 24, 32)
    assert m.dims(DataLoc.VERT) == (17, 25, 32)
    assert m.dims(DataLoc.CELL) == (16, 24, 32)
    # faces: vertex normal-axis, midpoint transverse
    assert m.dims(DataLoc.X_FACE) == (17, 24, 32)
    assert m.dims(DataLoc.Y_FACE) == (16, 25, 32)
    assert m.dims(DataLoc.Z_FACE) == (16, 24, 32)
    # d uses cell counts (mesh.f90:139)
    assert np.isclose(m.d[0], 1.0 / 16)


def test_mixed_periodic_bc_rejected():
    with pytest.raises(ValueError):
        Mesh((16, 16, 16), (1.0, 1.0, 1.0),
             ((BC.PERIODIC, BC.DIRICHLET),
              (BC.PERIODIC, BC.PERIODIC),
              (BC.PERIODIC, BC.PERIODIC)))


def test_coordinates():
    m = Mesh((17, 16, 16), (2.0, 1.0, 1.0),
             ((BC.DIRICHLET, BC.DIRICHLET),
              (BC.PERIODIC, BC.PERIODIC),
              (BC.PERIODIC, BC.PERIODIC)))
    xv = m.coords(DataLoc.VERT, 0)
    xm = m.coords(DataLoc.CELL, 0)
    assert xv[0] == 0.0 and np.isclose(xv[-1], 2.0)
    assert np.allclose(xm, (xv[:-1] + xv[1:]) / 2)
    # periodic axis: last vertex one spacing short of L
    yv = m.coords(DataLoc.VERT, 1)
    assert np.isclose(yv[-1], 1.0 - m.d[1])
