"""Explicit time integrators: Adams-Bashforth 1-4 and Runge-Kutta 1-4.

Functional port of the reference src/time_integrator.f90 (coefficients
:83-118). The AB derivative history is carried as a stacked array in the
step state (donated through jit) rather than rotated pointer blocks; RK
stages are unrolled statically inside the jitted step, with the
per-substage projection handled by the caller (cases/base.py run loop,
mirroring base_case.f90:261-300).

AB startup (istep < order) selects lower-order coefficients via a traced
table lookup so a single compiled step covers startup and steady phases.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

def kahan_add(x, inc, c):
    """One compensated accumulation step: returns (x + inc, c') where c'
    carries the rounding error of the addition (Kahan summation). XLA
    does not reassociate float arithmetic, so the cancellation pattern
    survives compilation."""
    y = inc - c
    t = x + y
    c_new = (t - x) - y
    return t, c_new


# AB coefficients (time_integrator.f90:108-118); row k = AB(k+1)
AB_COEFFS = np.array([
    [1.0, 0.0, 0.0, 0.0],
    [1.5, -0.5, 0.0, 0.0],
    [23.0 / 12, -4.0 / 3, 5.0 / 12, 0.0],
    [55.0 / 24, -59.0 / 24, 37.0 / 24, -3.0 / 8],
])

# RK stage tables (time_integrator.f90:83-106); rk_a[order][stage][j]
RK_A = {
    1: np.zeros((0, 3)),
    2: np.array([[0.5, 0.0, 0.0]]),
    3: np.array([[0.5, 0.0, 0.0],
                 [0.0, 0.75, 0.0]]),
    4: np.array([[0.5, 0.0, 0.0],
                 [0.0, 0.5, 0.0],
                 [0.0, 0.0, 1.0]]),
}
RK_B = {
    1: np.array([1.0]),
    2: np.array([0.0, 1.0]),
    3: np.array([2.0 / 9, 1.0 / 3, 4.0 / 9]),
    4: np.array([1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6]),
}


@dataclass(frozen=True)
class TimeIntegrator:
    """Scheme descriptor parsed from names like 'AB3' / 'RK3'."""

    name: str

    def __post_init__(self):
        kind, order = self.name[:2].upper(), int(self.name[2])
        if kind not in ("AB", "RK") or not 1 <= order <= 4:
            raise ValueError(f"unsupported time integrator {self.name!r}")
        object.__setattr__(self, "kind", kind)
        object.__setattr__(self, "order", order)

    @property
    def nstage(self) -> int:
        return self.order if self.kind == "RK" else 1

    @property
    def nolds(self) -> int:
        # AB(k) carries k-1 old derivatives; RK carries none across steps
        return self.order - 1 if self.kind == "AB" else 0

    def gdt(self, dt: float, istage: int) -> float:
        """Effective sub-timestep for BC ramping (time_integrator.f90:166-182)."""
        if self.kind == "AB":
            return dt
        return float(RK_B[self.order][istage]) * dt

    # ------------------------------------------------------------------
    def ab_step_compensated(self, fields, olds, comp, istep, rhs, dt):
        """AB step with Kahan-compensated state accumulation: the running
        compensation `comp` (one array per field) recovers the low-order
        bits the f32 state addition drops each step. This is the
        TPU-native substitute for the reference's f64 state
        (common.f90:6-16): f64 streaming on TPU is ~10x slower than f32,
        while the compensation costs two extra f32 passes. Returns
        (new_fields, new_olds, new_comp)."""
        order = self.order
        nstep = jnp.minimum(istep, order)
        dtype = jax.tree_util.tree_leaves(fields)[0].dtype
        coeffs = jnp.asarray(AB_COEFFS.astype(np.float64),
                             dtype=dtype)[nstep - 1]

        def upd(f, r, o, c):
            inc = dt * coeffs[0] * r
            for j in range(order - 1):
                # olds may be stored reduced-precision (X3D2_BF16_OLDS);
                # the combination always runs at state precision
                inc = inc + dt * coeffs[j + 1] * o[j].astype(f.dtype)
            if o and o[0].dtype != f.dtype:
                # reduced-precision history storage: PRE-PAY the future
                # rounding while r is exact in registers. The rhs stored
                # now re-enters the next (order-1) updates with the
                # steady coefficients c_1..c_{k-1}; adding
                # dt*sum(c_j)*(r - round(r)) here cancels that secular
                # bias exactly (the residual is the O(dt) time shift of
                # a tiny term), for zero extra HBM traffic.
                rb = r.astype(o[0].dtype).astype(f.dtype)
                inc = inc + (dt * self.future_coeff_sum()) * (r - rb)
            return kahan_add(f, inc, c)

        pairs = [upd(f, r, o, c)
                 for f, r, o, c in zip(fields, rhs, olds, comp)]
        new_fields = tuple(p[0] for p in pairs)
        new_comp = tuple(p[1] for p in pairs)
        if self.nolds == 0:
            new_olds = olds
        else:
            new_olds = tuple((r.astype(o[0].dtype),) + o[:-1]
                             for r, o in zip(rhs, olds))
        return new_fields, new_olds, new_comp

    def future_coeff_sum(self) -> float:
        """Sum of the steady-state AB coefficients that will multiply a
        derivative stored THIS step in future updates (c_1..c_{order-1};
        AB3: -16/12 + 5/12 = -11/12). Used by the reduced-precision
        history error feedback."""
        return float(AB_COEFFS[self.order - 1][1:self.order].sum())

    def ab_step(self, fields, olds, istep, rhs, dt):
        """One AB step. `fields`/`rhs` are tuples of arrays; `olds` is a
        matching tuple whose entries are (nolds,)-tuples of arrays (the
        derivative history, newest first); istep is a traced int32
        (1-based). Returns (new_fields, new_olds).

        The history "rotation" is a Python tuple reshuffle — under jit
        with donated state XLA aliases each rotated buffer to its input
        (zero HBM traffic), exactly like the reference's pointer rotation
        (time_integrator.f90:233-282) and unlike a stacked-array
        concatenate which would copy nolds fields per step."""
        order = self.order
        nstep = jnp.minimum(istep, order)
        # coefficient row for the current (possibly startup) order
        dtype = jax.tree_util.tree_leaves(fields)[0].dtype
        coeffs = jnp.asarray(AB_COEFFS.astype(np.float64), dtype=dtype)[nstep - 1]

        def upd(f, r, o):
            acc = f + dt * coeffs[0] * r
            for j in range(order - 1):
                acc = acc + dt * coeffs[j + 1] * o[j].astype(f.dtype)
            if o and o[0].dtype != f.dtype:
                # reduced-history error feedback (see
                # ab_step_compensated): pre-pay the stored rhs's future
                # rounding now, while r is exact
                rb = r.astype(o[0].dtype).astype(f.dtype)
                acc = acc + (dt * self.future_coeff_sum()) * (r - rb)
            return acc

        new_fields = tuple(upd(f, r, o)
                           for f, r, o in zip(fields, rhs, olds))
        if self.nolds == 0:
            new_olds = olds
        else:
            new_olds = tuple((r.astype(o[0].dtype),) + o[:-1]
                             for r, o in zip(rhs, olds))
        return new_fields, new_olds

    def rk_substage(self, fields0, ks, istage, dt):
        """Stage update for RK: given the step-initial fields and the list
        of stage derivatives computed so far, produce the fields for the
        next stage evaluation (istage < nstage) or the final step result
        (istage == nstage-1). Mirrors time_integrator.f90:166-231."""
        order = self.order
        last = istage == order - 1
        tab = RK_B[order] if last else RK_A[order][istage]

        def upd(f0, *kjs):
            acc = f0
            for c, k in zip(tab, kjs):
                if c != 0.0:
                    acc = acc + dt * float(c) * k
            return acc

        return jax.tree_util.tree_map(upd, fields0, *ks)

    def empty_olds(self, template, dtype=None):
        """Zero-initialised history: per field, a (nolds,)-tuple of
        arrays (kept as separate buffers so rotation is alias-only).
        `dtype` overrides the storage precision (X3D2_BF16_OLDS stores
        the AB history in bfloat16 — it only ever enters the update
        scaled by dt*c_j, so its rounding is ~4e-3 of an O(dt) term)."""
        return tuple(tuple(jnp.zeros(f.shape, dtype or f.dtype)
                           for _ in range(self.nolds)) for f in template)
