"""Online flow statistics: running means via incremental (Welford-style)
updates.

Parity with reference src/io/stats.f90: accumulators for
u,v,w, u^2,v^2,w^2, uv,uw,vw [, p, phi, phi^2] on the VERT grid
(stats.f90:33-50), update rule mean += (val-mean)/n (accumulate_mean:61-70),
accumulation gated by initstat/istatfreq, derived u' RMS and Reynolds
stresses at write time (write_stats:195-246), state persisted through
checkpoints.

The accumulate step is one jitted function updating a pytree of device
arrays (sharded like the fields under a device mesh).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


MOMENTS = ("umean", "vmean", "wmean", "uumean", "vvmean", "wwmean",
           "uvmean", "uwmean", "vwmean")


@partial(jax.jit, donate_argnums=0)
def _accumulate(acc, u, v, w, count, p=None, phi=None):
    inc = 1.0 / count.astype(u.dtype)
    vals = {"umean": u, "vmean": v, "wmean": w,
            "uumean": u * u, "vvmean": v * v, "wwmean": w * w,
            "uvmean": u * v, "uwmean": u * w, "vwmean": v * w}
    if p is not None:
        vals["pmean"] = p
    if phi is not None:
        vals["phimean"] = phi
        vals["phiphimean"] = phi * phi
    return {k: acc[k] + (vals[k] - acc[k]) * inc for k in acc}


class StatsManager:
    def __init__(self, case, config, verbose=True):
        self.config = config
        self.case = case
        self.verbose = verbose
        self.sample_count = 0
        self.acc = None
        self.is_active = config.initstat > 0
        self.last_written = -1

    def _init_acc(self, state):
        self.acc = {k: jnp.zeros_like(state["u"]) for k in MOMENTS}
        # pressure mean when the case keeps physical pressure
        # (reference stats.f90:44-45, gated on keep_pressure)
        self._with_p = (getattr(self.case, "keep_pressure", False)
                        and "p" in state)
        if self._with_p:
            self.acc["pmean"] = jnp.zeros_like(state["u"])
        # species moments (stats.f90:47-50)
        self._with_phi = "phi" in state
        if self._with_phi:
            self.acc["phimean"] = jnp.zeros_like(state["phi"])
            self.acc["phiphimean"] = jnp.zeros_like(state["phi"])

    def should_accumulate(self, timestep):
        c = self.config
        return (self.is_active and timestep >= c.initstat
                and timestep % max(1, c.istatfreq) == 0)

    def update(self, state, timestep):
        if not self.should_accumulate(timestep):
            return
        if self.acc is None:
            self._init_acc(state)
        self.sample_count += 1
        cnt = jnp.asarray(float(self.sample_count), state["u"].dtype)
        p = None
        if self._with_p:
            from ..postprocess import pressure_vert
            p = pressure_vert(self.case.solver, state["p"], self.case.dt)
        phi = state["phi"] if self._with_phi else None
        self.acc = _accumulate(self.acc, state["u"], state["v"], state["w"],
                               cnt, p=p, phi=phi)

    def should_write(self, timestep):
        c = self.config
        return (self.is_active and c.istatout > 0 and self.acc is not None
                and timestep % c.istatout == 0
                and timestep != self.last_written)

    def write(self, timestep):
        """Write means + derived RMS/Reynolds stresses
        (stats.f90:231-246)."""
        from ..parallel.multihost import gather_global, is_primary
        a = {k: gather_global(v) for k, v in self.acc.items()}
        out = dict(sample_count=self.sample_count,
                   umean=a["umean"], vmean=a["vmean"], wmean=a["wmean"],
                   uprime=np.sqrt(np.maximum(0, a["uumean"] - a["umean"]**2)),
                   vprime=np.sqrt(np.maximum(0, a["vvmean"] - a["vmean"]**2)),
                   wprime=np.sqrt(np.maximum(0, a["wwmean"] - a["wmean"]**2)),
                   uvmean=a["uvmean"] - a["umean"] * a["vmean"],
                   uwmean=a["uwmean"] - a["umean"] * a["wmean"],
                   vwmean=a["vwmean"] - a["vmean"] * a["wmean"])
        if "pmean" in a:
            out["pmean"] = a["pmean"]
        if "phimean" in a:
            out["phimean"] = a["phimean"]
            out["phiprime"] = np.sqrt(
                np.maximum(0, a["phiphimean"] - a["phimean"] ** 2))
        path = f"{self.config.stats_prefix}_{timestep:06d}.npz"
        self.last_written = timestep
        if not is_primary():
            return path
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **out)
        os.replace(tmp, path)
        if self.verbose:
            print(f"Statistics written: {path} (samples={self.sample_count})")
        return path

    # -- checkpoint integration ------------------------------------------
    def checkpoint_state(self):
        if self.acc is None:
            return None
        from ..parallel.multihost import gather_global
        d = {k: gather_global(v) for k, v in self.acc.items()}
        d["sample_count"] = np.asarray(self.sample_count)
        return d

    def restore(self, stats_dict):
        if not stats_dict or "sample_count" not in stats_dict:
            return
        self.sample_count = int(stats_dict["sample_count"])
        dtype = self.case.dtype
        self.acc = {k: jnp.asarray(v, dtype)
                    for k, v in stats_dict.items() if k != "sample_count"}
        self._with_p = "pmean" in self.acc
        self._with_phi = "phimean" in self.acc
