"""Case lifecycle and the time loop.

Equivalent of the reference's base_case layer (src/case/base_case.f90):
per-iteration substage loop {define_BC -> transeq -> forcings -> time step
-> apply_BC -> IBM -> pressure_correction} (base_case.f90:261-300), with
monitoring/IO hooks. The whole time step (all RK substages, or the AB
update with history) compiles into ONE jitted XLA program with donated
state, so fields never leave HBM between steps.

Case hooks (initial_conditions / forcings / apply_bc / body) must be pure
traceable functions of the state; concrete cases override them.
"""

from __future__ import annotations

import os as _os
import time as _time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import BC
from ..mesh import Mesh
from ..solver import NavierStokes
from ..time_integrators import TimeIntegrator
from ..io.monitoring import Monitor


@dataclass
class SolverParams:
    """Mirror of &solver_params (reference config.f90:33-44)."""

    Re: float = 1600.0
    time_intg: str = "AB3"
    dt: float = 1e-3
    n_iters: int = 1000
    n_output: int = 100
    poisson_solver_type: str = "FFT"
    der1st_scheme: str = "compact6"
    der2nd_scheme: str = "compact6"
    interpl_scheme: str = "classic"
    stagder_scheme: str = "compact6"
    n_species: int = 0
    pr_species: tuple = ()
    c_nu: float = 0.44
    nu0_nu: float = 4.0
    lowmem_transeq: bool = False  # accepted for config parity; the jitted
    lowmem_fft: bool = False      # step has a single memory plan under XLA
    ibm_on: bool = False
    # Kahan-compensated f32 state accumulation (AB schemes): recovers the
    # rounding error of each velocity update so long runs keep f64-grade
    # energy trajectories without TPU-emulated f64 streaming (the
    # reference simply defaults to f64 state, common.f90:6-16)
    compensated: bool = False


class BaseCase:
    """Owns solver + integrator + jitted step; concrete cases subclass."""

    name = "generic"

    def __init__(self, mesh: Mesh, params: SolverParams, dtype=jnp.float32,
                 monitor_path: str | None = "monitoring.csv", verbose=True,
                 seed: int = 0, case_cfg=None, keep_pressure=True):
        self.mesh = mesh
        self.params = params
        self.dtype = dtype
        self.seed = seed
        self.case_cfg = case_cfg
        # reference solver_t%keep_pressure (solver.f90:61): physical
        # pressure is only reconstructed when output needs it
        self.keep_pressure = keep_pressure
        schemes = dict(
            der1st_scheme=params.der1st_scheme,
            der2nd_scheme=params.der2nd_scheme,
            interpl_scheme=params.interpl_scheme,
            stagder_scheme=params.stagder_scheme,
            c_nu=params.c_nu, nu0_nu=params.nu0_nu,
        )
        nu = 1.0 / params.Re
        nu_species = tuple(nu / pr for pr in params.pr_species)
        pmethod = {"FFT": "matmul", "CG": "cg"}.get(
            params.poisson_solver_type.upper(), "matmul")
        self.solver = NavierStokes.build(mesh, nu, dtype=dtype,
                                         schemes=schemes,
                                         nu_species=nu_species,
                                         poisson_method=pmethod)
        self.ti = TimeIntegrator(params.time_intg)
        self.dt = params.dt
        # AB update fused into the final transeq sweep (in-kernel while
        # the velocity mid blocks are VMEM-resident) whenever the v3
        # Pallas kernels are active and no hook sits between transeq and
        # the update (forcings identity, plain accumulation). Species
        # RHS runs through the standalone v3 species sweeps on the
        # pre-update velocities and phi takes the same AB formula as an
        # XLA elementwise pass (stacked phi streams well).
        # Measured faster than the separate 15-pass AB elementwise update
        # on v5e at 512^3 (100.2 vs 103.9 ms/step at the time of the
        # comparison); X3D2_FUSED_AB=0 switches the fusion off for A/B
        # runs.
        import os as _os
        # X3D2_BF16_OLDS=1 stores the AB derivative history in bfloat16
        # (round-5 pass-count lever): the AB3 olds are 6 full-field
        # reads + 3 writes of the ~53-pass step, and history only ever
        # enters the update scaled by dt*c_j, so halving its bytes
        # saves ~4.5 passes (512^3: 62.8 -> 54.3 ms/step). Opt-in SPEED
        # mode, default off: measured full-trajectory KE parity is
        # 4.9e-5 even under HIGHEST+Kahan+error-feedback (README table)
        # — turbulent-stage quantization noise decorrelates step to
        # step and random-walks, so only the smooth-regime/systematic
        # component is recoverable (the feedback recovers it exactly).
        # Applies to both the fused-kernel and XLA AB paths.
        self._olds_dtype = (jnp.bfloat16 if (
            _os.environ.get("X3D2_BF16_OLDS", "0") == "1"
            and self.ti.kind == "AB" and self.ti.nolds >= 1) else None)
        # X3D2_BF16_ACC=1 additionally stores the transeq
        # cross-direction rhs PARTIAL streams in bfloat16 (round-5
        # second pass-count lever): the d2->d0->d1 accumulator moves 12
        # full-field passes (3 writes + 3+3 read/write + 3 reads), and
        # like the history the partials only enter the update scaled by
        # dt*c_j. Same ~1e-4-class speed-mode accuracy budget as the
        # bf16 history; kernel (fused-AB) path only — the XLA path's
        # partials are fusion-resident and move no HBM to save.
        self._acc_dtype = (jnp.bfloat16 if (
            _os.environ.get("X3D2_BF16_ACC", "0") == "1"
            and self.ti.kind == "AB" and self.ti.nolds >= 1) else None)
        self._fused_ab = None
        if (_os.environ.get("X3D2_FUSED_AB", "1") != "0"
                and self.ti.kind == "AB" and self.ti.nolds >= 1
                and not params.compensated
                and type(self).forcings is BaseCase.forcings
                and getattr(self.solver, "_transeq_v3", None) is not None):
            from ..common import DataLoc
            from ..ops.compact import PRECISION
            from ..ops.pallas_kernels import make_fused_transeq_ab_v3
            terms = 3 if PRECISION == jax.lax.Precision.HIGHEST else 2
            dims = mesh.dims(DataLoc.VERT)
            slab = getattr(self.solver, "_slab_pressure", None)
            if (slab is not None and slab[3].x_perm is not None
                    and type(self).apply_bc is BaseCase.apply_bc
                    and type(self).body is BaseCase.body
                    and not self.params.compensated
                    and max(dims) <= 256
                    and _os.environ.get("X3D2_XDIV_FUSED", "1") != "0"):
                # final sweep also emits the projection's x-transformed
                # divergence inputs (block-parity basis matching the
                # slab x-apply kernels); valid only when no hook can
                # modify the velocities between AB update and projection.
                # Size-gated by measurement: 256^3 8.53 vs 9.08 ms/step,
                # but 512^3 REGRESSES 66.3 -> 74.9 (the added transform
                # dots + scratch traffic stop hiding under the sweep
                # DMA; confirmed not the scratch RMW via a no-read
                # diagnostic)
                d64 = self.solver._fp_mats64()
                try:
                    self._fused_ab = make_fused_transeq_ab_v3(
                        self.solver.ops, self.solver.nu, dims,
                        self.ti.nolds, terms=terms,
                        xdiv=(d64["sx"], d64["ix"]),
                        olds_dtype=self._olds_dtype,
                        acc_dtype=self._acc_dtype)
                except ValueError:
                    pass
            self._ab_is_xdiv = self._fused_ab is not None
            if self._fused_ab is None:
                self._fused_ab = make_fused_transeq_ab_v3(
                    self.solver.ops, self.solver.nu, dims,
                    self.ti.nolds, terms=terms,
                    olds_dtype=self._olds_dtype,
                    acc_dtype=self._acc_dtype)
        # d2-in-C carry (round 4, experimental — X3D2_D2C=1 opts in):
        # the projection's kernel C also evaluates the NEXT step's
        # z-direction sweep on the just-corrected, VMEM-resident
        # velocities, and the AB chain starts at d0 with the carried
        # partials — the separate d2 kernel's three full-field reads
        # vanish from the step. Valid only when no hook can touch the
        # velocities between the correction and the next transeq.
        self._pipe_d2c = None
        if (_os.environ.get("X3D2_D2C", "0") == "1"
                and self._fused_ab is not None
                and self._acc_dtype is None
                and not getattr(self, "_ab_is_xdiv", False)
                and not params.n_species and not params.compensated
                and type(self).define_bc is BaseCase.define_bc
                and type(self).apply_bc is BaseCase.apply_bc
                and type(self).body is BaseCase.body
                and getattr(self.solver, "_pipe_pressure", None)
                is not None):
            from ..common import DataLoc
            from ..ops.compact import PRECISION
            from ..ops.pallas_kernels import (_make_sweep,
                                              make_fused_transeq_ab_v3
                                              as _mkab)
            from ..ops.pallas_poisson import make_pressure_pipe3
            terms = 3 if PRECISION == jax.lax.Precision.HIGHEST else 2
            dims = mesh.dims(DataLoc.VERT)
            try:
                self._pipe_d2c = make_pressure_pipe3(
                    self.solver, terms=terms, d2_sweep=True)
                self._fused_ab_nod2 = _mkab(
                    self.solver.ops, self.solver.nu, dims,
                    self.ti.nolds, terms=terms, skip_d2=True,
                    olds_dtype=self._olds_dtype)
                self._d2_boot = jax.jit(_make_sweep(
                    self.solver.ops[2], self.solver.nu, 2, dims,
                    terms, False, {}))
            except ValueError:
                self._pipe_d2c = None
        # RK substage update fused into the final transeq sweep (same
        # aliasing trick as AB; time_integrator.f90:166-231). The gate
        # mirrors the AB one: a forcings hook sits between transeq and
        # the update, so it must be the identity; species ride the
        # unfused path (their RK update stays an XLA elementwise pass).
        self._fused_rk = None
        if (_os.environ.get("X3D2_FUSED_RK", "1") != "0"
                and self.ti.kind == "RK" and not params.n_species
                and not params.compensated
                and type(self).forcings is BaseCase.forcings
                and getattr(self.solver, "_transeq_v3", None) is not None):
            from ..common import DataLoc
            from ..ops.compact import PRECISION
            from ..ops.pallas_kernels import make_fused_transeq_rk
            terms = 3 if PRECISION == jax.lax.Precision.HIGHEST else 2
            try:
                self._fused_rk = make_fused_transeq_rk(
                    self.solver.ops, self.solver.nu,
                    mesh.dims(DataLoc.VERT), self.ti.order, terms=terms)
            except ValueError:
                pass
        self.monitor = Monitor(self.solver, path=monitor_path,
                               verbose=verbose)
        self._step = jax.jit(self.step_fn, donate_argnums=0)
        # k steps chained in ONE dispatch (run() uses this between output
        # boundaries): saves the per-step host->device dispatch latency
        # (~1 ms/step at 512^3 through the axon relay). The fori body
        # unrolls `nolds` steps: the AB olds rotation permutes buffer
        # roles across carry positions, which a while loop pins — a
        # 1-step body forces XLA to insert full-field copies at the
        # backedge (measured 3.3 ms/step at 512^3); after nolds steps
        # every olds position holds an in-body-produced buffer again.
        self._chunk_period = max(
            1, self.ti.nolds if self.ti.kind == "AB" else 1)

        def _chunk_fn(state, k):
            m = self._chunk_period
            full, rem = divmod(k, m)

            def body(i, s):
                for _ in range(m):
                    s = self.step_fn(s)
                return s

            if full:
                state = jax.lax.fori_loop(0, full, body, state)
            for _ in range(rem):
                state = self.step_fn(state)
            return state

        self._chunk = jax.jit(_chunk_fn, donate_argnums=0,
                              static_argnums=1)

    # ------------------------------------------------------------------
    # hooks (overridden by concrete cases)
    # ------------------------------------------------------------------
    def initial_conditions(self):
        """Return dict of initial fields {'u','v','w'[, 'phi']}."""
        raise NotImplementedError

    def define_bc(self, fields, key, istep):
        """Per-substage pre-transeq hook (reference define_BC,
        base_case.f90:263): may modify fields (e.g. channel bulk-flow
        correction) and returns (fields, bc_data) where bc_data carries
        face-plane values/parameters consumed by apply_bc."""
        return fields, None

    def forcings(self, rhs, fields, istep):
        """Modify RHS tuple (base_case forcings hook)."""
        return rhs

    def apply_bc(self, fields, bc_data, gdt, istep):
        """Face-plane BC enforcement after the time update."""
        return fields

    def body(self, fields):
        """IBM or similar pre-projection modification (ibm.f90:148-170)."""
        return fields

    def postprocess(self, istep, t, state):
        self.monitor.write_step(t, state["u"], state["v"], state["w"])

    def checkpoint_extra(self):
        """Case-registered extra checkpoint state (reference
        checkpoint_state_t hook, io/checkpoint_state.f90): dict of
        name -> array persisted with checkpoints."""
        return None

    # ------------------------------------------------------------------
    def initial_state(self):
        fields = self.initial_conditions()
        u = jnp.asarray(fields["u"], self.dtype)
        v = jnp.asarray(fields["v"], self.dtype)
        w = jnp.asarray(fields["w"], self.dtype)
        from ..common import DataLoc
        state = {
            "u": u, "v": v, "w": w,
            "p": jnp.zeros(self.mesh.dims(DataLoc.CELL), self.dtype),
            "istep": jnp.asarray(1, jnp.int32),
            "key": jax.random.PRNGKey(self.seed),
        }
        nsp = self.params.n_species
        if nsp:
            state["phi"] = jnp.asarray(fields["phi"], self.dtype)
        if self.ti.kind == "AB":
            # AB1 carries a zero-length history (uniform state structure)
            tmpl = (u, v, w)
            if nsp:
                tmpl = tmpl + (state["phi"],)
            state["olds"] = self.ti.empty_olds(tmpl,
                                               dtype=self._olds_dtype)
            if self.params.compensated:
                state["comp"] = tuple(jnp.zeros(f.shape, f.dtype)
                                      for f in tmpl)
        if self._pipe_d2c is not None and not self.keep_pressure:
            # d2-in-C carry: the z-sweep RHS partials of the CURRENT
            # velocities (derived state — recomputed after restores,
            # see run(); checkpoints do not persist it)
            state["rhsp"] = tuple(self._d2_boot(u, v, w))
        return state

    def _rhs(self, fields, istep):
        u, v, w = fields[:3]
        if self.params.n_species:
            mom, sp = self.solver.transeq_with_species(u, v, w, fields[3])
            rhs = mom + (sp,)
        else:
            rhs = self.solver.transeq(u, v, w)
        return self.forcings(rhs, fields, istep)

    def _substage_post(self, fields, bc_data, gdt, istep, comp=None,
                       divs=None):
        """apply_BC -> IBM -> pressure_correction, one substage tail.
        With `comp`, the velocity correction u -= grad(p) accumulates
        through the Kahan compensation carried in the state. `divs`
        carries x-transformed divergence inputs pre-computed by the
        fused AB+xdiv sweep (only passed when apply_bc/body are the
        identity, so they cannot go stale)."""
        pre = fields
        fields = self.apply_bc(fields, bc_data, gdt, istep)
        fields = self.body(fields)
        if comp is not None:
            # BC/IBM hooks may overwrite points, invalidating their
            # compensation; zero comp wherever a hook changed the field
            # (skipped entirely when a hook is the identity)
            comp = tuple(
                c if f_new is f_old
                else jnp.where(f_new == f_old, c, jnp.zeros_like(c))
                for f_new, f_old, c in zip(fields[:3], pre[:3], comp[:3])
            ) + tuple(comp[3:])
        if comp is None:
            u, v, w, p = self.solver.pressure_correction(
                *fields[:3], keep_pressure=self.keep_pressure, divs=divs)
            return (u, v, w) + tuple(fields[3:]), p, None
        from ..time_integrators import kahan_add
        dpdx, dpdy, dpdz, p = self.solver.pressure_grads(
            *fields[:3], keep_pressure=self.keep_pressure)
        outs, newc = [], []
        for f, g, c in zip(fields[:3], (dpdx, dpdy, dpdz), comp[:3]):
            t, c2 = kahan_add(f, -g, c)
            outs.append(t)
            newc.append(c2)
        return tuple(outs) + tuple(fields[3:]), p, tuple(newc) + tuple(
            comp[3:])

    def step_fn(self, state):
        """One full time step (all substages) - jit-compiled once.
        Substage sequence mirrors base_case.f90:261-300:
        define_BC -> transeq -> forcings -> time update -> apply_BC ->
        IBM body -> pressure_correction."""
        nsp = self.params.n_species
        fields = (state["u"], state["v"], state["w"])
        if nsp:
            fields = fields + (state["phi"],)
        istep = state["istep"]
        key = state["key"]
        dt = self.dt

        if self.ti.kind == "AB" and self._fused_ab is None:
            key, sub = jax.random.split(key)
            fields, bc_data = self.define_bc(fields, sub, istep)
            rhs = self._rhs(fields, istep)
            if "comp" in state:
                fields, olds, comp = self.ti.ab_step_compensated(
                    fields, state["olds"], state["comp"], istep, rhs, dt)
                fields, p, comp = self._substage_post(
                    fields, bc_data, self.ti.gdt(dt, 0), istep, comp=comp)
                new = {"olds": olds, "comp": comp}
            else:
                fields, olds = self.ti.ab_step(fields, state["olds"],
                                               istep, rhs, dt)
                fields, p, _ = self._substage_post(fields, bc_data,
                                                   self.ti.gdt(dt, 0), istep)
                new = {"olds": olds}
        elif self.ti.kind == "AB":  # fused transeq+AB kernel chain
            key, sub = jax.random.split(key)
            fields, bc_data = self.define_bc(fields, sub, istep)
            from ..time_integrators import AB_COEFFS
            nstep = jnp.minimum(istep, self.ti.order)
            dtc = dt * jnp.asarray(AB_COEFFS, self.dtype)[nstep - 1]
            if self._olds_dtype is not None:
                # col 4: error-feedback coefficient for the reduced
                # (bf16) history storage — dt * sum of the steady
                # coefficients that will multiply this step's rhs in
                # future updates (time_integrators.future_coeff_sum)
                dtc = jnp.concatenate(
                    [dtc, jnp.full((1,), dt * self.ti.future_coeff_sum(),
                                   self.dtype)])
            if "rhsp" in state:
                # d2-in-C carry: chain starts at d0 with the partials
                # the previous projection's kernel C emitted; the
                # projection here returns the NEXT carry (hooks are
                # identity by the build gate, so _substage_post's
                # apply_bc/body are skipped)
                mom, rhs = self._fused_ab_nod2(
                    *fields[:3], state["olds"][:3], dtc, state["rhsp"])
                olds = tuple((r,) + o[:-1]
                             for r, o in zip(rhs, state["olds"][:3]))
                (un, vn, wn), rhsp = self._pipe_d2c(*mom)
                new = {"olds": olds, "rhsp": tuple(rhsp),
                       "u": un, "v": vn, "w": wn,
                       "p": state["p"], "istep": istep + 1, "key": key}
                return new
            prhs = None
            if nsp:
                # species RHS on the pre-update velocities (the same
                # time level the momentum RHS uses inside the kernel);
                # standalone v3 species sweeps — the merged ride-along
                # variant measured 0.63x and was removed (r3 on-chip)
                prhs = self.solver.transeq_species_all(fields[3],
                                                       *fields[:3])
            out = self._fused_ab(*fields[:3], state["olds"][:3], dtc)
            divs = None
            if len(out) == 3:  # AB+xdiv pencil chain
                mom, rhs, divs = out
            else:
                mom, rhs = out
            olds = tuple((r,) + o[:-1]
                         for r, o in zip(rhs, state["olds"][:3]))
            if nsp:
                phi_olds = state["olds"][3]
                phi = fields[3] + dtc[0] * prhs
                for j, ph in enumerate(phi_olds):
                    phi = phi + dtc[1 + j] * ph
                if self._olds_dtype is not None:
                    # reduced-history error feedback for the species AB
                    # update (same correction the momentum kernel
                    # applies via dtc col 4)
                    prhs_b = prhs.astype(self._olds_dtype)
                    phi = phi + dtc[4] * (
                        prhs - prhs_b.astype(phi.dtype))
                    prhs = prhs_b
                fields = mom + (phi,)
                olds = olds + ((prhs,) + phi_olds[:-1],)
            else:
                fields = mom
            fields, p, _ = self._substage_post(fields, bc_data,
                                               self.ti.gdt(dt, 0), istep,
                                               divs=divs)
            new = {"olds": olds}
        elif self._fused_rk is not None:  # RK, fused substage updates
            from ..time_integrators import RK_A, RK_B
            fields0 = None
            ks = []
            order = self.ti.order
            for istage in range(order):
                key, sub = jax.random.split(key)
                fields, bc_data = self.define_bc(fields, sub, istep)
                if istage == 0:
                    fields0 = fields
                stage = self._fused_rk[istage]
                tab = RK_B[order] if istage == order - 1 \
                    else RK_A[order][istage]
                row = ([dt * float(tab[istage])]
                       + [dt * float(tab[j]) for j in stage.prev_nz])
                dtc = jnp.asarray(row + [0.0] * (4 - len(row)),
                                  self.dtype)
                mom, rhs = stage(*fields[:3], fields0[:3], ks, dtc)
                ks.append(rhs)
                fields = mom + tuple(fields[3:])
                fields, p, _ = self._substage_post(
                    fields, bc_data, self.ti.gdt(dt, istage), istep)
            new = {}
            if "olds" in state:
                new["olds"] = state["olds"]
        else:  # RK
            fields0 = None
            ks = []
            for istage in range(self.ti.nstage):
                key, sub = jax.random.split(key)
                fields, bc_data = self.define_bc(fields, sub, istep)
                if istage == 0:
                    # step-initial condition saved AFTER define_BC mutations
                    # (reference saves olds(1) at istage 1 post-define_BC)
                    fields0 = fields
                rhs = self._rhs(fields, istep)
                ks.append(rhs)
                fields = self.ti.rk_substage(fields0, ks, istage, dt)
                fields, p, _ = self._substage_post(
                    fields, bc_data, self.ti.gdt(dt, istage), istep)
            new = {}
            if "olds" in state:
                new["olds"] = state["olds"]

        if p is None:
            # keep_pressure=False slab path skips the spectral-q write;
            # carry the previous (diagnostic-only) pressure state through
            p = state["p"]
        new.update({"u": fields[0], "v": fields[1], "w": fields[2],
                    "p": p, "istep": istep + 1, "key": key})
        if nsp:
            new["phi"] = fields[3]
        return new

    # ------------------------------------------------------------------
    def run(self, n_iters: Optional[int] = None, state=None,
            n_output: Optional[int] = None, io_manager=None,
            fresh: Optional[bool] = None):
        """Time loop (reference base_case run, base_case.f90:181-353):
        step -> stats accumulation -> monitoring -> checkpoint/snapshot.

        `fresh` marks whether `state` is a new initial condition (write
        the t=0 monitoring row) or a checkpoint restore (skip it, even
        when the checkpoint was saved before the first step completed).
        Default: states built here are fresh; caller-provided states
        fall back to the istep==1 heuristic."""
        n_iters = n_iters or self.params.n_iters
        n_output = n_output or self.params.n_output
        if state is None:
            state = self.initial_state()
            if fresh is None:
                fresh = True
        if fresh is None:
            fresh = int(state["istep"]) == 1
        if "rhsp" in state:
            # d2-in-C: the carried z-sweep partials are DERIVED from
            # u,v,w; refresh them whenever a state enters the loop from
            # outside (covers checkpoint restores, where the persisted
            # file has no rhsp — recomputation is bit-exact)
            state = dict(state)
            state["rhsp"] = tuple(self._d2_boot(state["u"], state["v"],
                                                state["w"]))
        if fresh and int(state["istep"]) == 1:
            # fresh (non-restart) run: record the t=0 observables even
            # when the caller built the state (the CLI always does)
            self.postprocess(0, 0.0, state)
        t0 = _time.perf_counter()
        t_rep = t0
        start = int(state["istep"])
        # Without an io_manager the only host-side work is the every-
        # n_output postprocess, so the steps between boundaries chain
        # into one dispatch (self._chunk). With an io_manager, stats/IO
        # cadences need the state every step: per-step dispatch.
        chunked = (io_manager is None
                   and _os.environ.get("X3D2_CHUNK", "1") != "0")
        it = start
        end = start + n_iters
        while it < end:
            if chunked:
                # run through the next output boundary (the iteration
                # with it % n_output == 0, postprocessed below), capped
                # at the final iteration
                k = 1 if it % n_output == 0 \
                    else n_output - it % n_output + 1
                k = min(k, end - it)
                state = self._chunk(state, k) if k > 1 else \
                    self._step(state)
                it += k - 1
            else:
                state = self._step(state)
            t = it * self.dt
            if io_manager is not None:
                io_manager.update_stats(state, it)
            if it % n_output == 0:
                self.postprocess(it, t, state)
                if self.monitor.verbose:
                    # per-reported-step wall clock (base_case.f90:244-266)
                    jax.block_until_ready(state["u"])
                    now = _time.perf_counter()
                    print(f"Time for this time step: "
                          f"{(now - t_rep) / n_output * 1e3:.2f} ms "
                          f"(iteration {it})")
                    t_rep = now
            if io_manager is not None:
                io_manager.handle_io_step(state, it, t)
            it += 1
        jax.block_until_ready(state["u"])
        elapsed = _time.perf_counter() - t0
        if io_manager is not None:
            io_manager.finalise(state, start + n_iters - 1,
                                (start + n_iters - 1) * self.dt)
        if self.monitor.verbose:
            print(f"Total time {elapsed:.3f}s for {n_iters} iters "
                  f"({elapsed / n_iters * 1e3:.2f} ms/step)")
        return state
