"""x3d2_tpu: TPU-native incompressible Navier-Stokes DNS/LES framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of xcompact3d's
x3d2 (6th-order compact finite differences, fractional-step pressure
projection, spectral Poisson solver, TGV/channel/cylinder/generic cases).
"""

from .common import BC, DataLoc
from .mesh import Mesh

__version__ = "0.1.0"
