"""Reduced-precision transeq partials (X3D2_BF16_ACC=1).

The cross-direction rhs accumulator is 12 full-field passes of the
step (d2 writes 3, d0 reads+writes 3+3, the final AB-fused sweep reads
3); like the AB history (test_bf16_olds.py) the partials only enter
the state update scaled by dt*c_j, so storing the streams in bfloat16
halves that traffic for a ~4e-3 relative rounding on an O(dt) term
(round-5 second pass-count lever; the reference accumulates at full
precision in registers, solver.f90 transeq_* fused pipelines).
Covers: bit-exact quantization semantics of a reduced sweep, chain
agreement with the f32-partial chain, the alias-pairing combinations
(acc/olds reduced independently), and the case env wiring.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.ops.pallas_kernels import (make_fused_transeq_ab_v3,
                                         make_transeq_dir_v3)

SHAPE = (128, 128, 256)  # lane-axis v3 sweeps need n >= 256


def _case(monkeypatch=None, acc=False, olds=False, shape=SHAPE,
          dtype=jnp.float32):
    if monkeypatch is not None:
        monkeypatch.setenv("X3D2_BF16_ACC", "1" if acc else "0")
        monkeypatch.setenv("X3D2_BF16_OLDS", "1" if olds else "0")
    mesh = Mesh(shape, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    return TGVCase(mesh, params, dtype=dtype, monitor_path=None,
                   verbose=False, keep_pressure=False)


def _fields(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    return [0.1 * jax.random.normal(k, shape, jnp.float32) for k in ks]


def test_bf16_acc_sweep_bit_exact():
    """A reduced accumulate sweep stores EXACTLY bf16(f32_result): the
    kernel adds the (exactly upcast) bf16 acc at f32 and rounds only at
    the store, so it must match the f32 sweep + external rounding
    bitwise."""
    ca = _case()
    u, v, w, a0, a1, a2 = _fields(SHAPE)
    acc = tuple(x.astype(jnp.bfloat16) for x in (a0, a1, a2))
    ops0 = ca.solver.ops[0]
    red = make_transeq_dir_v3(ops0, ca.solver.nu, 0, SHAPE,
                              accumulate=True, interpret=True,
                              acc_dtype=jnp.bfloat16)
    ref = make_transeq_dir_v3(ops0, ca.solver.nu, 0, SHAPE,
                              accumulate=True, interpret=True)
    out_r = red(u, v, w, acc=acc)
    out_f = ref(u, v, w, acc=tuple(x.astype(jnp.float32) for x in acc))
    for r, f in zip(out_r, out_f):
        assert r.dtype == jnp.bfloat16
        assert np.array_equal(np.asarray(r).view(np.uint16),
                              np.asarray(f.astype(jnp.bfloat16))
                              .view(np.uint16))


@pytest.mark.parametrize("olds_red", [False, True])
def test_bf16_acc_chain_matches_f32_within_budget(olds_red):
    """The fused AB chain with reduced partials (each alias-pairing
    combination) tracks the f32-partial chain to the bf16 rounding of
    the dt-scaled rhs terms."""
    ca = _case()
    nu = ca.solver.nu
    odt = jnp.bfloat16 if olds_red else None
    red = make_fused_transeq_ab_v3(ca.solver.ops, nu, SHAPE, nolds=2,
                                   interpret=True, olds_dtype=odt,
                                   acc_dtype=jnp.bfloat16)
    ref = make_fused_transeq_ab_v3(ca.solver.ops, nu, SHAPE, nolds=2,
                                   interpret=True, olds_dtype=odt)
    u, v, w, o0, o1, o2 = _fields(SHAPE)
    holds = tuple((0.05 * o, 0.02 * o) for o in (o0, o1, o2))
    if olds_red:
        holds = tuple(tuple(x.astype(jnp.bfloat16) for x in o)
                      for o in holds)
    dt = 1e-3
    row = [dt, 1.5 * dt, -0.5 * dt, 0.0]
    if olds_red:
        row.append(dt)  # error-feedback column
    dtc = jnp.asarray(row, jnp.float32)
    (ur, vr, wr), rhs_r = red(u, v, w, holds, dtc)
    (uf, vf, wf), rhs_f = ref(u, v, w, holds, dtc)
    for q in (ur, vr, wr):
        assert q.dtype == jnp.float32
    for r in rhs_r:
        assert r.dtype == (jnp.bfloat16 if olds_red else jnp.float32)
    scale = float(jnp.max(jnp.abs(uf)))
    for r, f in zip((ur, vr, wr), (uf, vf, wf)):
        err = float(jnp.max(jnp.abs(r - f.astype(r.dtype))))
        # two bf16 roundings of dt-scaled partial sums: O(1e-5) here
        assert err < 5e-4 * scale, f"{err:.2e} vs {scale:.2e}"
    # the rhs streams themselves carry the quantization directly
    for r, f in zip(rhs_r, rhs_f):
        err = float(jnp.max(jnp.abs(r.astype(jnp.float32)
                                    - f.astype(jnp.float32))))
        rs = float(jnp.max(jnp.abs(f.astype(jnp.float32))))
        assert err < 2e-2 * rs, f"{err:.2e} vs {rs:.2e}"


def test_bf16_acc_env_wiring(monkeypatch):
    """X3D2_BF16_ACC sets _acc_dtype on AB cases (kernel path only —
    the XLA path's partials never leave the fusion) and the D2C carry
    gate excludes reduced partials (its acc0 arrives at f32 from the
    projection kernel)."""
    shape = (32, 32, 32)
    cb = _case(monkeypatch, acc=True, shape=shape)
    assert cb._acc_dtype == jnp.bfloat16
    assert cb._pipe_d2c is None
    ca = _case(monkeypatch, acc=False, shape=shape)
    assert ca._acc_dtype is None
    # skip_d2 + acc_dtype is rejected at the builder
    with pytest.raises(ValueError):
        make_fused_transeq_ab_v3(ca.solver.ops, ca.solver.nu, SHAPE,
                                 nolds=2, skip_d2=True, interpret=True,
                                 acc_dtype=jnp.bfloat16)


def test_bf16_acc_xla_trajectory_unaffected(monkeypatch):
    """On a small grid (kernel gates cold) the flag must be a no-op:
    the XLA path has no HBM partial streams to reduce."""
    shape = (32, 32, 32)
    ca = _case(monkeypatch, acc=False, shape=shape)
    cb = _case(monkeypatch, acc=True, shape=shape)
    assert ca._fused_ab is None and cb._fused_ab is None
    sa, sb = ca.initial_state(), cb.initial_state()
    for _ in range(3):
        sa, sb = ca.step_fn(sa), cb.step_fn(sb)
    for k in ("u", "v", "w"):
        assert np.array_equal(np.asarray(sa[k]), np.asarray(sb[k]))
