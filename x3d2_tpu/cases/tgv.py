"""Taylor-Green vortex case (reference src/case/tgv.f90).

Analytic IC u = sin(x)cos(y)cos(z), v = -cos(x)sin(y)cos(z), w = 0
(tgv.f90:56-63); fully periodic box, no BCs/forcings; monitoring of
enstrophy and kinetic-energy decay is the validation signal
(BASELINE.md north star: KE-decay parity to 1e-6 at 512^3, Re=1600).
"""

from __future__ import annotations

import numpy as np

from ..common import DataLoc
from .base import BaseCase


class TGVCase(BaseCase):
    name = "tgv"

    def initial_conditions(self):
        X, Y, Z = self.mesh.coord_grids(DataLoc.VERT)
        u = np.sin(X) * np.cos(Y) * np.cos(Z)
        v = -np.cos(X) * np.sin(Y) * np.cos(Z)
        w = np.zeros(np.broadcast_shapes(X.shape, Y.shape, Z.shape))
        w = np.broadcast_to(w, np.broadcast_shapes(u.shape, v.shape))
        fields = {"u": u, "v": v, "w": np.zeros_like(u)}
        if self.params.n_species:
            phi = np.stack([u] * self.params.n_species)
            fields["phi"] = phi
        return fields
