"""Iterative (preconditioned BiCGStab) pressure Poisson solver.

The reference declares a 'CG' poisson_solver_type but ships only a stub
that zeroes the pressure (solver.f90:680-691 poisson_cg). Here it is a
real matrix-free preconditioned Krylov solve on the composite operator
A = divergence_v2p(gradient_p2v(.)) -- exactly the discrete operator the
projection needs, for ANY BC/stretching combination (including the
'bottom' stretching the spectral path rejects). The spectral matmul solve
(the uniform-metric operator inverse) serves as the right preconditioner,
so on uniform meshes it converges immediately and on stretched meshes at
a rate set by the metric contrast. BiCGStab rather than CG because the
compact-scheme div/grad composition is nonsymmetric.

A is singular (constant nullspace); iterates are kept mean-free. The
iteration is a lax.while_loop inside the jitted step.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


class CGPoisson:
    def __init__(self, apply_A, precond=None, tol=1e-8, max_iters=100):
        """apply_A: p -> div(grad(p)); precond: r -> approx A^-1 r."""
        self.apply_A = apply_A
        self.precond = precond if precond is not None else (lambda r: r)
        self.tol = tol
        self.max_iters = max_iters

    def __call__(self, f: jax.Array) -> jax.Array:
        """Right-preconditioned BiCGStab. The composite compact-scheme
        operator div(grad(.)) is NOT symmetric (interp/stagder pairs are
        not mutual transposes), so plain CG is invalid; BiCGStab keeps the
        short recurrences while handling the nonsymmetry."""
        demean = lambda x: x - jnp.mean(x)
        A = lambda p: demean(self.apply_A(demean(self.precond(p))))
        f = demean(f)
        tol2 = jnp.asarray(self.tol, f.dtype) ** 2 * jnp.sum(f * f) + 1e-300

        x0 = jnp.zeros_like(f)
        r0 = f
        rhat = r0
        eps = 1e-300

        def cond(c):
            return jnp.logical_and(jnp.sum(c["r"] * c["r"]) > tol2,
                                   c["it"] < self.max_iters)

        def body(c):
            rho_new = jnp.sum(rhat * c["r"])
            beta = (rho_new / (c["rho"] + eps)) * (c["alpha"]
                                                   / (c["omega"] + eps))
            p = c["r"] + beta * (c["p"] - c["omega"] * c["v"])
            v = A(p)
            alpha = rho_new / (jnp.sum(rhat * v) + eps)
            s = c["r"] - alpha * v
            t = A(s)
            omega = jnp.sum(t * s) / (jnp.sum(t * t) + eps)
            x = c["x"] + alpha * p + omega * s
            r = s - omega * t
            return dict(x=x, r=r, p=p, v=v, rho=rho_new, alpha=alpha,
                        omega=omega, it=c["it"] + 1)

        init = dict(x=x0, r=r0, p=jnp.zeros_like(f), v=jnp.zeros_like(f),
                    rho=jnp.asarray(1.0, f.dtype),
                    alpha=jnp.asarray(1.0, f.dtype),
                    omega=jnp.asarray(1.0, f.dtype),
                    it=jnp.asarray(0, jnp.int32))
        out = jax.lax.while_loop(cond, body, init)
        # un-precondition the solution (right preconditioning: y = M x)
        return demean(self.precond(demean(out["x"])))
