"""The Incompact3d fractional-step algorithm as pure JAX functions.

Functional equivalent of the reference's solver layer:
  - transeq (skew-symmetric convection-diffusion RHS):
    src/solver.f90:291-505, component/operator pairing
    src/backend/omp/backend.f90:235-262, fused substitution formula
    src/backend/omp/kernels/distributed.f90:316-330
  - vector calculus (divergence_v2c, gradient_c2v, curl, laplacian):
    src/vector_calculus.f90
  - pressure correction: src/solver.f90:693-739

Everything here is shape-polymorphic pure-jax on Cartesian (nx,ny,nz)
arrays; the per-direction "reorder" steps of the reference vanish (XLA
handles layout), and each tds_solve becomes one MXU matmul (ops/compact.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import BC, DataLoc
from .mesh import Mesh
from .ops.compact import CompactOp, apply_matrix
from .ops.dirops import AxisOps
from .ops.fft_poisson import SpectralPoisson


def _bcast(vec: np.ndarray, axis: int, dtype) -> jax.Array:
    """Reshape a per-point 1-D factor for broadcasting along `axis`."""
    shape = [1, 1, 1]
    shape[axis] = -1
    return jnp.asarray(vec, dtype=dtype).reshape(shape)


@dataclass(frozen=True)
class NavierStokes:
    """Incompressible Navier-Stokes solver operators (reference solver_t)."""

    mesh: Mesh
    ops: tuple[AxisOps, AxisOps, AxisOps]
    nu: float
    dtype: object = jnp.float32
    poisson: Optional[Callable] = None
    nu_species: tuple = ()

    @classmethod
    def build(cls, mesh: Mesh, nu: float, *, dtype=jnp.float32,
              schemes: dict | None = None, nu_species=(),
              poisson_method: str = "matmul") -> "NavierStokes":
        """poisson_method: 'matmul' (separable real transforms on the MXU,
        the TPU-native default) or 'fft' (literal port of the reference's
        FFT + fold + phase-shift pipeline; both verified equivalent)."""
        from .ops.dirops import build_all_ops
        schemes = schemes or {}
        ops = build_all_ops(mesh, dtype=dtype, **schemes)
        # 'bottom' one-sided stretching runs the SPECTRAL path like the
        # symmetric stretchings. The reference's own assembly
        # (poisson_fft.f90:320-422, untested upstream) drops the aliased
        # k=-1/k=-2 metric couplings in the first spectral row; with that
        # fixed (exact factor 2 on A[0,1], A[0,2] — adjudicated
        # operator-by-operator in tools/adjudicate_bottom.py) the path
        # passes the div(grad) roundtrip at 1e-12. The BiCGStab solver
        # (poisson_method='cg') remains available for any stretching.
        if poisson_method == "matmul":
            from .ops.matmul_poisson import MatmulPoisson
            poisson = MatmulPoisson(mesh, ops, dtype=dtype)
        elif poisson_method == "fft":
            poisson = SpectralPoisson(mesh, ops, dtype=dtype)
        elif poisson_method == "cg":
            # real preconditioned CG on the composite div(grad(.)) operator
            # (the reference's 'CG' type is an unimplemented stub,
            # solver.f90:680-691); preconditioned by the uniform-metric
            # spectral solve so it handles any stretching
            from .ops.cg_poisson import CGPoisson
            from .ops.matmul_poisson import MatmulPoisson
            ns0 = cls(mesh=mesh, ops=ops, nu=nu, dtype=dtype, poisson=None,
                      nu_species=tuple(nu_species))
            if any(mesh.stretched):
                from .ops.dirops import build_all_ops as _bao
                twin = Mesh(mesh.global_vert_dims, mesh.L, mesh.BCs)
                pre = MatmulPoisson(twin, _bao(twin, dtype=dtype,
                                               **schemes), dtype=dtype)
            else:
                pre = MatmulPoisson(mesh, ops, dtype=dtype)
            tol = 1e-10 if dtype == jnp.float64 else 1e-6
            poisson = CGPoisson(
                lambda p: ns0.divergence_v2p(*ns0.gradient_p2v(p)),
                precond=pre, tol=tol)
        else:
            raise ValueError(f"unknown poisson_method {poisson_method!r}")
        ns = cls(mesh=mesh, ops=ops, nu=nu, dtype=dtype, poisson=poisson,
                 nu_species=tuple(nu_species))
        # Pallas kernels: default on TPU for supported shapes; disable with
        # X3D2_PALLAS=0. CPU runs always use the einsum paths.
        # (Projection matmuls stay on einsum: a Pallas dense apply was
        # measured slower than XLA's HIGH einsum chain and removed;
        # a fully banded Pallas projection also measured slower at 512^3
        # -- 60.2 vs 48.3 ms -- because the extra standalone-transform
        # HBM passes outweigh the flop savings at ~400 GB/s effective.)
        import os as _os
        want = _os.environ.get("X3D2_PALLAS", "1") != "0"
        dd = jax.config.jax_default_device
        on_tpu = (jax.default_backend() == "tpu"
                  and (dd is None or getattr(dd, "platform", "tpu") == "tpu"))
        # build the transform-fused projection matrices eagerly -- creating
        # device constants inside a jit trace would leak tracers
        ns._fused_pressure_mats()
        if want and on_tpu:
            from .ops.pallas_kernels import (make_fused_transeq_v3,
                                             transeq_v3_supported)
            from .ops.pallas_transeq import (fused_transeq_supported,
                                             make_fused_transeq)
            from .common import DataLoc
            shape = mesh.dims(DataLoc.VERT)
            if transeq_v3_supported(ns, shape):
                # v3: banded bf16x3 direction sweeps with roll-free
                # 3-stream windows and cross-direction accumulation
                # (512^3 transeq: 43.6 ms vs 99 ms for the v1 kernels).
                # X3D2_MATMUL_PRECISION=highest selects bf16x6 kernels
                # (the KE-parity mode: drift ~6e-11/step vs ~8e-9 at HIGH)
                from .ops.compact import PRECISION
                terms = 3 if PRECISION == jax.lax.Precision.HIGHEST else 2
                object.__setattr__(ns, "_transeq_v3",
                                   make_fused_transeq_v3(ns.ops, nu, shape,
                                                         terms=terms))
                if ns.nu_species:
                    # species sweeps share the conv window reads and
                    # chain via accumulator aliasing (vs 9 dense einsum
                    # applies per species per step on the fallback path)
                    from .ops.pallas_kernels import make_fused_species_v3
                    try:
                        object.__setattr__(
                            ns, "_species_v3",
                            make_fused_species_v3(ns.ops, ns.nu_species,
                                                  shape, terms=terms))
                    except ValueError:
                        pass
            elif fused_transeq_supported(ns, shape):
                # v1 dense fused kernel (HIGHEST): non-128-multiple shapes
                # <= 256 that v3's block sizes cannot tile
                fns = tuple(make_fused_transeq(ns.ops[a], nu, a, shape)
                            for a in range(3))
                object.__setattr__(ns, "_pallas_transeq", fns)
            from .ops.pallas_poisson import (make_pressure_slab,
                                             slab_pressure_supported)
            if slab_pressure_supported(ns):
                # resident-slab projection kernels: the y/z div stages,
                # spectral solve and z/y grad stages run back to back on
                # VMEM-resident x-planes (~20 HBM passes -> 8)
                from .ops.compact import PRECISION
                terms = 3 if PRECISION == jax.lax.Precision.HIGHEST else 2
                object.__setattr__(ns, "_slab_pressure",
                                   make_pressure_slab(ns, terms=terms))
                from .ops.pallas_poisson import (make_pressure_pipe3,
                                                 pipe3_supported)
                if (pipe3_supported(ns, terms)
                        and _os.environ.get("X3D2_PIPE3", "1") != "0"):
                    # 3-stage projection pipeline (keep_pressure=False
                    # fast path): 17 HBM passes vs the x-first chain's
                    # 21, q never leaves VMEM (see pallas_poisson.py)
                    object.__setattr__(ns, "_pipe_pressure",
                                       make_pressure_pipe3(ns,
                                                           terms=terms))
        return ns

    # ------------------------------------------------------------------
    # transport equation RHS
    # ------------------------------------------------------------------
    def _transeq_component(self, q, conv, axis, op_du: CompactOp,
                           op_dud: CompactOp, op_d2u: CompactOp, nu):
        """RHS contribution of one velocity component along one axis:
        -0.5*(conv*dq + d(q*conv)) + nu*d2q, with the stretched-mesh
        second-derivative correction (omp/kernels/distributed.f90:316-330)."""
        dq = op_du(q, axis)
        dqd = op_dud(q * conv, axis)
        d2q = op_d2u(q, axis)
        if op_d2u.stretch_correct is not None and np.any(op_d2u.stretch_correct):
            d2q = d2q + dq * _bcast(op_d2u.stretch_correct, axis, self.dtype)
        return -0.5 * (conv * dq + dqd) + nu * d2q

    def transeq(self, u, v, w):
        """Skew-symmetric momentum RHS (reference transeq_default,
        solver.f90:291-389). Operator pairing per direction follows
        transeq_omp_dist (omp/backend.f90:235-262): the direction-aligned
        component uses (der1st, der1st_sym, der2nd); transverse components
        use (der1st_sym, der1st, der2nd_sym).

        TPU notes: the 6 unique symmetric products u_i*u_j are computed
        once (the reference recomputes them per sweep); each operator
        application is a separate einsum -- measured faster on v5e than
        batching fields into stacked matmuls, whose materialised stacks
        cost more HBM traffic than the MXU efficiency gained."""
        v3 = getattr(self, "_transeq_v3", None)
        if v3 is not None:
            return v3(u, v, w)
        fns = getattr(self, "_pallas_transeq", None)
        if fns is not None:
            outs = [fns[a](u, v, w) for a in range(3)]
            return tuple(outs[0][i] + outs[1][i] + outs[2][i]
                         for i in range(3))
        if getattr(self, "_halo_mode", False):
            # sharded axes: per-op halo applies (no row-stacking -- each
            # wrapped op carries its own ppermute exchange)
            comps = (u, v, w)
            rhs = [0.0, 0.0, 0.0]
            for axis in range(3):
                o = self.ops[axis]
                for c in range(3):
                    if c == axis:
                        dus, duds, d2s = o.der1st, o.der1st_sym, o.der2nd
                    else:
                        dus, duds, d2s = o.der1st_sym, o.der1st, o.der2nd_sym
                    rhs[c] = rhs[c] + self._transeq_component(
                        comps[c], comps[axis], axis, dus, duds, d2s, self.nu)
            return tuple(rhs)

        comps = (u, v, w)
        prods = {}

        def prod(i, j):
            key = (min(i, j), max(i, j))
            if key not in prods:
                prods[key] = comps[key[0]] * comps[key[1]]
            return prods[key]

        rhs = [0.0, 0.0, 0.0]
        for axis in range(3):
            o = self.ops[axis]
            conv = comps[axis]
            corr = o.der2nd.stretch_correct
            has_corr = corr is not None and np.any(corr)
            cb = _bcast(corr, axis, self.dtype) if has_corr else None
            for c in range(3):
                q = comps[c]
                if c == axis:
                    op_du, op_dud, op_d2u = o.der1st, o.der1st_sym, o.der2nd
                else:
                    op_du, op_dud, op_d2u = o.der1st_sym, o.der1st, o.der2nd_sym
                # dq and d2q share the input q: stack the operator rows so
                # q is read once and the MXU runs one larger matmul
                M2 = jnp.concatenate([op_du.M, op_d2u.M])
                both = apply_matrix(M2, q, axis)
                nq = op_du.n_out
                dq = jax.lax.slice_in_dim(both, 0, nq, 1, axis)
                d2q = jax.lax.slice_in_dim(both, nq, 2 * nq, 1, axis)
                dqd = op_dud(prod(c, axis), axis)
                if has_corr:
                    d2q = d2q + dq * cb
                rhs[c] = rhs[c] - 0.5 * (conv * dq + dqd) + self.nu * d2q
        return tuple(rhs)

    def transeq_species(self, phi, u, v, w, nu_s):
        """Species convection-diffusion RHS (solver.f90:507-601): the
        scalar uses (der1st, der1st_sym, der2nd) against the velocity
        component aligned with each direction (omp/backend.f90:226-231)."""
        comps = (u, v, w)
        rhs = 0.0
        for axis in range(3):
            o = self.ops[axis]
            rhs = rhs + self._transeq_component(
                phi, comps[axis], axis, o.der1st, o.der1st_sym, o.der2nd,
                nu_s)
        return rhs

    def transeq_species_all(self, phi, u, v, w):
        """All-species RHS from a stacked (nsp, nx, ny, nz) field. Uses
        the v3 species sweeps (one conv-window read shared across
        species per direction) when built, else the per-species
        operator path."""
        nsp = len(self.nu_species)
        sp = getattr(self, "_species_v3", None)
        if sp is not None and nsp and nsp <= 8:
            return jnp.stack(sp(tuple(phi[i] for i in range(nsp)),
                                u, v, w))
        return jnp.stack([self.transeq_species(phi[i], u, v, w,
                                               self.nu_species[i])
                          for i in range(nsp)])

    def transeq_with_species(self, u, v, w, phi):
        """Momentum + all-species RHS: (rhs3, sp_rhs stacked). A merged
        variant (phi riding the momentum sweeps) was measured 0.63x the
        standalone species kernels on chip (r3,
        validation/onchip_queue_prof_species.log) and removed."""
        return (self.transeq(u, v, w),
                self.transeq_species_all(phi, u, v, w))

    # ------------------------------------------------------------------
    # vector calculus (reference vector_calculus.f90)
    # ------------------------------------------------------------------
    def divergence_v2p(self, u, v, w):
        """div(u) from VERT to CELL grid (vector_calculus.f90:142-246):
        per direction staggered derivative of the aligned component and
        midpoint interpolation of transverse ones, x -> y -> z."""
        ox, oy, oz = self.ops
        du = ox.stagder_v2p(u, 0)
        dv = ox.interpl_v2p(v, 0)
        dw = ox.interpl_v2p(w, 0)
        duv = oy.interpl_v2p(du, 1) + oy.stagder_v2p(dv, 1)
        dw = oy.interpl_v2p(dw, 1)
        return oz.interpl_v2p(duv, 2) + oz.stagder_v2p(dw, 2)

    def gradient_p2v(self, p):
        """grad(p) from CELL to VERT grid (vector_calculus.f90:248-332),
        z -> y -> x sweep order."""
        ox, oy, oz = self.ops
        if getattr(self, "_halo_mode", False):
            p_z = oz.interpl_p2v(p, 2)
            dpdz = oz.stagder_p2v(p, 2)
            p_zy = oy.interpl_p2v(p_z, 1)
            dpdy = oy.stagder_p2v(p_z, 1)
            dpdz = oy.interpl_p2v(dpdz, 1)
            return (ox.stagder_p2v(p_zy, 0), ox.interpl_p2v(dpdy, 0),
                    ox.interpl_p2v(dpdz, 0))
        # operator pairs sharing an input are row-stacked into one matmul
        Mz = jnp.concatenate([oz.interpl_p2v.M, oz.stagder_p2v.M])
        both = apply_matrix(Mz, p, 2)
        nzv = oz.interpl_p2v.n_out
        p_z = jax.lax.slice_in_dim(both, 0, nzv, 1, 2)
        dpdz = jax.lax.slice_in_dim(both, nzv, 2 * nzv, 1, 2)
        My = jnp.concatenate([oy.interpl_p2v.M, oy.stagder_p2v.M])
        both = apply_matrix(My, p_z, 1)
        nyv = oy.interpl_p2v.n_out
        p_zy = jax.lax.slice_in_dim(both, 0, nyv, 1, 1)
        dpdy = jax.lax.slice_in_dim(both, nyv, 2 * nyv, 1, 1)
        dpdz = oy.interpl_p2v(dpdz, 1)
        dpdx = ox.stagder_p2v(p_zy, 0)
        dpdy = ox.interpl_p2v(dpdy, 0)
        dpdz = ox.interpl_p2v(dpdz, 0)
        return dpdx, dpdy, dpdz

    def curl(self, u, v, w):
        """curl at vertices (vector_calculus.f90:40-140)."""
        ox, oy, oz = self.ops
        o_i = oy.der1st(w, 1) - oz.der1st(v, 2)
        o_j = oz.der1st(u, 2) - ox.der1st(w, 0)
        o_k = ox.der1st(v, 0) - oy.der1st(u, 1)
        return o_i, o_j, o_k

    def laplacian(self, f):
        """Laplacian at the field's location (vector_calculus.f90:380-436).
        Note: like the reference, no stretched-mesh first-derivative
        correction is applied here (standalone der2nd)."""
        ox, oy, oz = self.ops
        return ox.der2nd(f, 0) + oy.der2nd(f, 1) + oz.der2nd(f, 2)

    # ------------------------------------------------------------------
    # pressure projection
    # ------------------------------------------------------------------
    def _fp_mats64(self):
        """Float64 numpy masters of the transform-fused projection
        matrices (see _fused_pressure_mats), or None when the Poisson is
        not the matmul variant. Consumed by the jnp cache below and by the
        Pallas slab kernels (ops/pallas_poisson.py) for bf16 hi/lo splits."""
        from .ops.matmul_poisson import MatmulPoisson
        if not isinstance(self.poisson, MatmulPoisson):
            return None
        if "_fp64_cache" in self.__dict__:
            return self._fp64_cache
        po = self.poisson
        d = {}
        f64 = [np.asarray(T, np.float64) for T in po.Tf64]
        i64 = [np.asarray(T, np.float64) for T in po.Ti64]
        ox, oy, oz = self.ops
        # divergence stages fused with forward transforms (per axis)
        d["sx"] = f64[0] @ ox.stagder_v2p.M64
        d["ix"] = f64[0] @ ox.interpl_v2p.M64
        d["sy"] = f64[1] @ oy.stagder_v2p.M64
        d["iy"] = f64[1] @ oy.interpl_v2p.M64
        d["sz"] = f64[2] @ oz.stagder_v2p.M64
        d["iz"] = f64[2] @ oz.interpl_v2p.M64
        # gradient stages fused with inverse transforms
        d["gz_i"] = oz.interpl_p2v.M64 @ i64[2]
        d["gz_s"] = oz.stagder_p2v.M64 @ i64[2]
        d["gy_i"] = oy.interpl_p2v.M64 @ i64[1]
        d["gy_s"] = oy.stagder_p2v.M64 @ i64[1]
        d["gx_i"] = ox.interpl_p2v.M64 @ i64[0]
        d["gx_s"] = ox.stagder_p2v.M64 @ i64[0]
        # row-stacked same-input pairs for the gradient z/y stages
        d["gz_is"] = np.concatenate([d["gz_i"], d["gz_s"]])
        d["gy_is"] = np.concatenate([d["gy_i"], d["gy_s"]])
        object.__setattr__(self, "_fp64_cache", d)
        return d

    def _fused_pressure_mats(self):
        """Fold the matmul-Poisson spectral transforms into the staggered
        divergence/gradient operator matrices: since both the transforms
        and the div/grad stages are separable per-axis matrices, Tf@op and
        op@Ti compose at setup, eliminating the six standalone transform
        matmuls from the projection. Returns None when the Poisson is not
        the matmul variant."""
        if "_fp_cache" in self.__dict__:
            return self._fp_cache
        d64 = self._fp_mats64()
        if d64 is None:
            return None
        # device constants built eagerly (jnp ops inside a jit trace would
        # create tracers that leak through the cache)
        d = {k: jnp.asarray(M, self.dtype) for k, M in d64.items()}
        object.__setattr__(self, "_fp_cache", d)
        return d

    def pressure_grads(self, u, v, w, keep_pressure=True):
        """Pressure-gradient stage of the fractional-step projection:
        returns (dpdx, dpdy, dpdz, p) so callers can apply the velocity
        correction themselves (e.g. with Kahan-compensated accumulation,
        cases/base.py).

        With the matmul Poisson, the spectral transforms are folded into
        the div/grad matrices (see _fused_pressure_mats). Reconstructing
        physical p from the spectral solution costs three extra matmuls,
        so like the reference (solver_t%keep_pressure, solver.f90:61) it
        only happens when requested; otherwise the returned p is the
        spectral-basis solution (fine for checkpoint round-trips, not for
        visualisation)."""
        # halo mode never uses the fused matrices: check it first so the
        # sharded variant does not materialise ~13MB of unused constants
        # mid-trace (make_halo_solver drops the eager cache)
        d = (None if getattr(self, "_halo_mode", False)
             else self._fused_pressure_mats())
        if (d is None or self.poisson.stretch_solver is not None
                or getattr(self, "_halo_mode", False)):
            # halo mode: the unfused path keeps div/grad as banded compact
            # ops (ppermute halo exchanges); only the spectral transforms
            # inside self.poisson are global contractions (the GSPMD
            # analogue of the reference's FFT all-to-alls)
            div_u = self.divergence_v2p(u, v, w)
            p = self.poisson(div_u)
            dpdx, dpdy, dpdz = self.gradient_p2v(p)
            return dpdx, dpdy, dpdz, p

        po = self.poisson

        def ap(name, t, axis):
            return apply_matrix(d[name], t, axis)

        slab = getattr(self, "_slab_pressure", None)
        if slab is not None:
            # resident-slab Pallas kernels for the y/z stages + solve,
            # and pipelined full-x-tile kernels for the x stages
            # (ops/pallas_poisson.py)
            q, p_zy, dpdy, dpdz = self._slab_mid(u, v, w)
            xk = slab[2]
            dpdx = xk["gx_s"](p_zy)
            dpdy = xk["gx_i"](dpdy)
            dpdz = xk["gx_i"](dpdz)
            if keep_pressure:
                p = q
                for a in range(3):
                    # q's y basis may be block-parity-ordered (bfly)
                    Ti_a = (slab[3].ti_x, slab[3].ti_y,
                            slab[3].ti_z)[a]
                    p = apply_matrix(Ti_a, p, a)
            else:
                p = q
            return dpdx, dpdy, dpdz, p
        # divergence in the spectral basis (transform-fused stages)
        du = ap("sx", u, 0)
        dv = ap("ix", v, 0)
        dw = ap("ix", w, 0)
        duv = ap("iy", du, 1) + ap("sy", dv, 1)
        dw = ap("iy", dw, 1)
        F = ap("iz", duv, 2) + ap("sz", dw, 2)
        # spectral solve diagonal
        q = F * po.inv_waves
        # gradient from the spectral solution (inverse-transform-fused)
        nzv = self.ops[2].interpl_p2v.n_out
        both = ap("gz_is", q, 2)
        p_z = jax.lax.slice_in_dim(both, 0, nzv, 1, 2)
        dpdz = jax.lax.slice_in_dim(both, nzv, 2 * nzv, 1, 2)
        nyv = self.ops[1].interpl_p2v.n_out
        both = ap("gy_is", p_z, 1)
        p_zy = jax.lax.slice_in_dim(both, 0, nyv, 1, 1)
        dpdy = jax.lax.slice_in_dim(both, nyv, 2 * nyv, 1, 1)
        # every stage must consume its axis' inverse transform once
        dpdz = ap("gy_i", dpdz, 1)
        dpdx = ap("gx_s", p_zy, 0)
        dpdy = ap("gx_i", dpdy, 0)
        dpdz = ap("gx_i", dpdz, 0)
        if keep_pressure:
            # physical pressure for output: inverse transforms of q
            p = q
            for a in range(3):
                p = apply_matrix(po.Ti[a], p, a)
        else:
            p = q
        return dpdx, dpdy, dpdz, p

    def _slab_mid(self, u, v, w, want_q=True, divs=None):
        """x-stage divergence + slab kernels: everything of the
        projection except the gradient x stage (ops/pallas_poisson.py).
        Uses the merged k1+k2 kernel (q never leaves VMEM); with
        want_q=False the no-q variant also skips q's HBM write. `divs`
        supplies pre-transformed divergence inputs (the fused AB+xdiv
        sweep) so the three x-stage kernels are skipped."""
        slab = self._slab_pressure
        xk = slab[2]
        if divs is not None:
            du, dv, dw = divs
        elif "div3" in xk:
            # merged 3-field x-stage kernel (one pallas_call, 6 streams)
            du, dv, dw = xk["div3"](u, v, w)
        else:
            du = xk["sx"](u)
            dv = xk["ix"](v)
            dw = xk["ix"](w)
        import os as _os
        if _os.environ.get("X3D2_MID_SPLIT", "0") == "1":
            # A/B experiment: k1+k2 as separate pallas_calls (re-adds
            # the q HBM round-trip but gains inter-kernel DMA/compute
            # overlap, which on-chip chains recover ~40% of isolated
            # kernel time — validation/prof_pressure_r4b.log)
            q = slab[0](du, dv, dw)
            return ((q if want_q else None),) + tuple(slab[1](q))
        if not want_q and hasattr(slab[3], "no_q"):
            return (None,) + tuple(slab[3].no_q(du, dv, dw))
        return slab[3](du, dv, dw)

    def pressure_correction(self, u, v, w, keep_pressure=True, divs=None):
        """Fractional-step projection (solver.f90:693-739): returns the
        divergence-free velocity and the pseudo-pressure field (CELL grid,
        scaled by dt like the reference; rescale p/dt only for output).
        `divs`: pre-transformed divergence inputs from the fused AB+xdiv
        sweep (slab path only)."""
        rp = getattr(self, "_repencil_pressure", None)
        if rp is not None:
            # sharded: repencilled slab projection (2DECOMP analogue,
            # parallel/shard_kernels.py)
            return rp(u, v, w, keep_pressure)
        pipe = getattr(self, "_pipe_pressure", None)
        if (pipe is not None and divs is None and not keep_pressure
                and not getattr(self, "_halo_mode", False)
                and self.poisson.stretch_solver is None):
            # 3-stage pipeline: slab div -> x+solve kernel -> slab
            # grad+correction (pallas_poisson.make_pressure_pipe3)
            un, vn, wn = pipe(u, v, w)
            return un, vn, wn, None
        slab = getattr(self, "_slab_pressure", None)
        if (slab is not None and not getattr(self, "_halo_mode", False)
                and self.poisson.stretch_solver is None):
            # velocity correction fused into the gradient x-stage kernels
            q, p_zy, dpdy_s, dpdz_s = self._slab_mid(
                u, v, w, want_q=keep_pressure, divs=divs)
            xk = slab[2]
            if "gradsub3" in xk:
                un, vn, wn = xk["gradsub3"](p_zy, dpdy_s, dpdz_s, u, v, w)
            else:
                un = xk["gx_s_sub"](p_zy, u)
                vn = xk["gx_i_sub"](dpdy_s, v)
                wn = xk["gx_i_sub"](dpdz_s, w)
            # q is None when not kept: the caller carries its previous
            # pressure state (p is diagnostic — never a step input)
            p = q
            if keep_pressure:
                for a in range(3):
                    # q's y basis may be block-parity-ordered (bfly)
                    Ti_a = (slab[3].ti_x, slab[3].ti_y,
                            slab[3].ti_z)[a]
                    p = apply_matrix(Ti_a, p, a)
            return un, vn, wn, p
        dpdx, dpdy, dpdz, p = self.pressure_grads(
            u, v, w, keep_pressure=keep_pressure)
        return u - dpdx, v - dpdy, w - dpdz, p
