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

Path note: the hand-written Pallas kernels carry no VJP rules of their
own, but they compute the *same discrete operators* as the pure-XLA
einsum path (interpret-mode equality is tested throughout tests/). So
the production (kernel) step is made differentiable by a
``jax.custom_vjp`` whose backward is the exact vjp of the einsum-path
step at the same input state (:func:`differentiable_step`): primal =
fast Pallas forward, adjoint = exact discrete adjoint of the scheme.
:func:`rollout` applies this automatically whenever the case runs the
kernel path — ``X3D2_PALLAS=1`` gradients now work out of the box.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _kernels_active(case) -> bool:
    """True when the case's step dispatches any Pallas fast path."""
    s = case.solver
    return (getattr(case, "_fused_ab", None) is not None
            or getattr(case, "_fused_rk", None) is not None
            or getattr(s, "_transeq_v3", None) is not None
            or getattr(s, "_pallas_transeq", None) is not None
            or getattr(s, "_species_v3", None) is not None
            or getattr(s, "_slab_pressure", None) is not None
            or getattr(s, "_pipe_pressure", None) is not None)


def make_einsum_twin(case):
    """Rebuild ``case`` with every Pallas fast path disabled.

    The twin computes the identical discrete step through the pure-XLA
    einsum/FFT operators (the semantic definition the kernels are
    equality-tested against), so its jax.vjp is the exact discrete
    adjoint of the scheme. Construction-time env flags other than
    X3D2_PALLAS are inherited, keeping the two states structurally
    identical (same keys/dtypes)."""
    old = os.environ.get("X3D2_PALLAS")
    os.environ["X3D2_PALLAS"] = "0"
    try:
        kw = dict(dtype=case.dtype, monitor_path=None, verbose=False,
                  seed=case.seed, case_cfg=case.case_cfg,
                  keep_pressure=case.keep_pressure)
        twin = type(case)(case.mesh, case.params, **kw)
    finally:
        if old is None:
            os.environ.pop("X3D2_PALLAS", None)
        else:
            os.environ["X3D2_PALLAS"] = old
    return twin


def differentiable_step(case, einsum_case=None):
    """The case's step with production forward + exact einsum adjoint.

    When the case runs Pallas kernels, returns a ``jax.custom_vjp``
    wrapper: the primal evaluates ``case.step_fn`` (the fast kernel
    chain), and the backward evaluates the vjp of the einsum-path step
    at the same input state. Because both paths implement the same
    discrete operators (to rounding), this is the exact adjoint of the
    scheme while keeping the forward pass at production speed — the
    reference has no adjoint capability at all (an adjoint of
    base_case.f90's imperative loop would be a second hand-written
    solver).

    Limitations: the d2-in-C carry (X3D2_D2C=1) changes the state
    structure and is not supported here (it is an opt-in experiment,
    default off)."""
    if not _kernels_active(case):
        return case.step_fn
    if getattr(case, "_pipe_d2c", None) is not None:
        raise NotImplementedError(
            "differentiable_step does not support the X3D2_D2C carry")
    cached = getattr(case, "_diff_step", None)
    if cached is not None:
        return cached
    estep = (einsum_case or make_einsum_twin(case)).step_fn
    kstep = case.step_fn

    @jax.custom_vjp
    def step(s):
        return kstep(s)

    def fwd(s):
        return kstep(s), s

    def bwd(s, ct):
        _, vjpf = jax.vjp(estep, s)
        return vjpf(ct)

    step.defvjp(fwd, bwd)
    case._diff_step = step
    return step


def rollout(case, state, n_steps: int, remat: bool = True):
    """Advance ``state`` by ``n_steps`` full time steps (one jittable
    program; differentiable end to end — including on the production
    Pallas path, via :func:`differentiable_step`).

    ``remat=True`` rematerialises each step in the backward pass so
    reverse-mode memory stays at one state pytree per step boundary
    instead of every intermediate of every step.
    """
    step = differentiable_step(case)
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
