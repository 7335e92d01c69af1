"""Run-time monitoring: enstrophy, divergence, kinetic energy time series.

Equivalent of the reference's monitoring layer
(src/postprocess/monitoring.f90:46-90 and scalar_series.f90): writes
``monitoring.csv`` with the same columns (time, enstrophy, div_u_max,
div_u_mean) plus kinetic energy (the TGV parity signal). The observable
computation is one fused jitted function instead of backend reduction
kernels + MPI_Allreduce: jnp reductions lower to XLA all-reduces over the
device mesh automatically.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def make_observables_fn(solver):
    """Returns a jitted fn (u,v,w) -> dict of scalars."""

    @jax.jit
    def observables(u, v, w):
        cx, cy, cz = solver.curl(u, v, w)
        ngrid = u.size
        enstrophy = 0.5 * (jnp.sum(cx * cx) + jnp.sum(cy * cy)
                           + jnp.sum(cz * cz)) / ngrid
        div = solver.divergence_v2p(u, v, w)
        adiv = jnp.abs(div)
        ke = 0.5 * jnp.mean(u * u + v * v + w * w)
        return {
            "enstrophy": enstrophy,
            "div_u_max": jnp.max(adiv),
            # reference normalises the mean by the *global* grid count of
            # the div field's location (omp/backend.f90:803)
            "div_u_mean": jnp.sum(adiv) / div.size,
            "ke": ke,
        }

    return observables


class Monitor:
    """CSV scalar-series writer (reference scalar_series_t)."""

    COLUMNS = ["time", "enstrophy", "div_u_max", "div_u_mean", "ke"]

    def __init__(self, solver, path="monitoring.csv", append=False,
                 verbose=True):
        self.fn = make_observables_fn(solver)
        self.path = path
        self.verbose = verbose
        self.rows = []
        # multi-host: observables compute collectively on every process
        # (their values are replicated); only process 0 writes/prints
        # (reference scalar_series root-rank pattern)
        from ..parallel.multihost import is_primary
        if not is_primary():
            path = None
            self.path = None
            self.verbose = False
        if path is not None:
            mode = "a" if append else "w"
            self._fh = open(path, mode, newline="")
            self._csv = csv.writer(self._fh)
            if not append:
                self._csv.writerow(self.COLUMNS)
        else:
            self._fh = None

    def write_step(self, t, u, v, w):
        obs = {k: float(v) for k, v in self.fn(u, v, w).items()}
        row = [t] + [obs[c] for c in self.COLUMNS[1:]]
        self.rows.append(row)
        if self._fh is not None:
            self._csv.writerow(row)
            self._fh.flush()
        if self.verbose:
            print(f"t={t:10.4f} enstrophy={obs['enstrophy']:.8e} "
                  f"div max/mean={obs['div_u_max']:.3e}/"
                  f"{obs['div_u_mean']:.3e} ke={obs['ke']:.8e}")
        return obs

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
