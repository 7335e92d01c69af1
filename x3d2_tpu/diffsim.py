"""Differentiable and batched simulation — capabilities beyond the
reference that fall out of the TPU-native (functional jax) design.

The reference solver (/root/reference/src/case/base_case.f90:181-353) is
an imperative Fortran time loop: computing a sensitivity of any output
with respect to inputs requires hand-writing an adjoint solver, and
running an ensemble requires launching independent MPI jobs. Here the
whole time step is one pure jitted function of the state pytree
(cases/base.py step_fn), so both come for free from jax transforms:

- ``jax.grad`` through :func:`rollout` gives the exact discrete adjoint
  of the full scheme (compact-scheme transeq, AB/RK update, spectral
  projection) — usable for data assimilation, optimal initial
  conditions, or forcing design.
- ``jax.vmap`` over the state gives ensemble propagation (uncertainty
  quantification) with one compiled program, batched onto the MXU.

Memory: an n-step reverse-mode rollout would store every intermediate
field; ``remat=True`` wraps the step in ``jax.checkpoint`` so the
backward pass recomputes each step's internals from its input state —
peak memory O(n_steps) state copies -> O(1) plus one recompute per step
(the standard checkpoint/rematerialisation trade).

Path note: the differentiable path is the pure-XLA (einsum/FFT) solver;
the hand-written Pallas kernels carry no VJP rules. On CPU that path is
automatic; on TPU export ``X3D2_PALLAS=0`` before building the case to
take gradients (solver.py:99-106).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout(case, state, n_steps: int, remat: bool = True):
    """Advance ``state`` by ``n_steps`` full time steps (one jittable
    program; differentiable end to end).

    ``remat=True`` rematerialises each step in the backward pass so
    reverse-mode memory stays at one state pytree per step boundary
    instead of every intermediate of every step.
    """
    step = case.step_fn
    if remat:
        step = jax.checkpoint(step)

    def body(s, _):
        return step(s), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def objective(case, observable, n_steps: int, remat: bool = True):
    """Build a differentiable scalar objective of the initial velocity.

    Returns ``f(u0, v0, w0) -> float``: runs ``n_steps`` steps from the
    case's initial state with the velocity replaced by the arguments and
    applies ``observable(final_state)``. Use ``jax.grad(f, (0, 1, 2))``
    for the adjoint sensitivity d(observable)/d(initial velocity).
    """

    def f(u0, v0, w0):
        state = dict(case.initial_state(), u=u0, v=v0, w=w0)
        return observable(rollout(case, state, n_steps, remat=remat))

    return f


def kinetic_energy(state):
    """Mean kinetic energy 0.5<|u|^2> — the TGV monitoring observable
    (postprocess/monitoring.f90 semantics)."""
    u, v, w = state["u"], state["v"], state["w"]
    return 0.5 * jnp.mean(u * u + v * v + w * w)


def ensemble_rollout(case, states, n_steps: int, remat: bool = False):
    """Propagate a batch of states (leading axis on every leaf) through
    ``n_steps`` steps with one vmapped program."""
    return jax.vmap(lambda s: rollout(case, s, n_steps, remat=remat))(
        states)


def stack_states(states):
    """Stack a list of state pytrees into one batched state."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
