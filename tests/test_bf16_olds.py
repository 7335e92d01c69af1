"""Reduced-precision AB history (X3D2_BF16_OLDS=1).

The AB derivative history only enters the update scaled by dt*c_j, so
storing it in bfloat16 halves 3*nolds reads + 3 writes of the step's
HBM traffic for a ~4e-3 relative rounding on an O(dt) term (round-5
pass-count lever; reference keeps f64 history, time_integrator.f90).
Covers: the XLA ab_step path, the fused Pallas kernel chain (interpret
mode), their mutual agreement, drift vs the f32-history run, and the
bit-exact checkpoint round trip (bf16 archives as exact f32 upcasts —
.npz degrades non-native dtypes to void).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.ops.pallas_kernels import (make_fused_transeq_ab_v3,
                                         make_fused_transeq_v3)

SHAPE = (128, 128, 256)  # lane-axis v3 sweeps need n >= 256


def _case(monkeypatch=None, bf16=False, shape=SHAPE, dtype=jnp.float32):
    if monkeypatch is not None:
        monkeypatch.setenv("X3D2_BF16_OLDS", "1" if bf16 else "0")
    mesh = Mesh(shape, (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    return TGVCase(mesh, params, dtype=dtype, monitor_path=None,
                   verbose=False, keep_pressure=False)


def test_bf16_olds_state_dtype_and_drift(monkeypatch):
    """The XLA ab_step path under the flag: history is stored bf16, the
    trajectory stays within the bf16 rounding of the dt-scaled history
    terms of the f32-history run."""
    shape = (32, 32, 32)
    ca = _case(monkeypatch, bf16=False, shape=shape)
    cb = _case(monkeypatch, bf16=True, shape=shape)
    assert cb._olds_dtype == jnp.bfloat16
    sa, sb = ca.initial_state(), cb.initial_state()
    for o in sb["olds"]:
        for a in o:
            assert a.dtype == jnp.bfloat16
    for _ in range(4):
        sa, sb = ca.step_fn(sa), cb.step_fn(sb)
    for o in sb["olds"]:
        for a in o:
            assert a.dtype == jnp.bfloat16
    uscale = float(jnp.max(jnp.abs(sa["u"])))
    for k in ("u", "v", "w"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        # 4 steps x dt*|c_j|*(bf16 ulp ~4e-3)*|rhs| — O(1e-4) at most
        assert err < 5e-4 * uscale, f"{k}: {err:.2e} vs {uscale:.2e}"


def test_bf16_olds_fused_matches_xla_path(monkeypatch):
    """The fused kernel chain with olds_dtype=bf16 vs the separate v3
    transeq + ab_step under the same flag: both quantize the history
    identically, so they agree to kernel tiling noise + at most one
    bf16 ulp on boundary-straddling rhs values."""
    ca = _case(monkeypatch, bf16=True)   # XLA ab_step path (gate cold)
    cb = _case(monkeypatch, bf16=True)
    nu = ca.solver.nu
    v3 = make_fused_transeq_v3(ca.solver.ops, nu, SHAPE, interpret=True)
    object.__setattr__(ca.solver, "_transeq_v3", v3)
    assert ca._fused_ab is None
    cb._fused_ab = make_fused_transeq_ab_v3(
        cb.solver.ops, nu, SHAPE, nolds=2, interpret=True,
        olds_dtype=jnp.bfloat16)

    sa, sb = ca.initial_state(), cb.initial_state()
    for _ in range(3):  # covers the AB3 startup rows
        sa, sb = ca.step_fn(sa), cb.step_fn(sb)
    for o in sb["olds"]:
        for a in o:
            assert a.dtype == jnp.bfloat16
    uscale = float(jnp.max(jnp.abs(sa["u"])))
    for k in ("u", "v", "w"):
        err = float(jnp.max(jnp.abs(sa[k] - sb[k])))
        assert err < 1e-4 * uscale, f"{k}: {err:.2e} vs {uscale:.2e}"


def test_bf16_olds_checkpoint_bit_exact(monkeypatch, tmp_path):
    """bf16 history round-trips through the global .npz checkpoint
    bit-exactly (archived as exact f32 upcasts, restored at the live
    state's dtype) and the restarted trajectory is identical."""
    from x3d2_tpu.config import CheckpointConfig, StatsConfig
    from x3d2_tpu.io.manager import IOManager

    shape = (16, 16, 16)
    prefix = str(tmp_path / "bfck")
    ck = CheckpointConfig(checkpoint_freq=4, checkpoint_prefix=prefix,
                          keep_checkpoint=True)
    ca = _case(monkeypatch, bf16=True, shape=shape, dtype=jnp.float64)
    io_a = IOManager(ca, ck, StatsConfig())
    sa = ca.run(n_iters=8, state=ca.initial_state(), n_output=10**9,
                io_manager=io_a)

    cb = _case(monkeypatch, bf16=True, shape=shape, dtype=jnp.float64)
    ck2 = CheckpointConfig(restart_from_checkpoint=True,
                           restart_file=f"{prefix}_000004.npz",
                           checkpoint_prefix=prefix)
    io_b = IOManager(cb, ck2, StatsConfig())
    sb = io_b.handle_restart(cb.initial_state())
    for o in sb["olds"]:
        for a in o:
            assert a.dtype == jnp.bfloat16
    sb = cb.run(n_iters=4, state=sb, n_output=10**9)
    for k in ("u", "v", "w"):
        d = np.max(np.abs(np.asarray(sa[k]) - np.asarray(sb[k])))
        assert d < 1e-15, (k, d)
    for oa, ob in zip(sa["olds"], sb["olds"]):
        for a, b in zip(oa, ob):
            assert a.dtype == b.dtype == jnp.bfloat16
            assert np.array_equal(np.asarray(a).view(np.uint16),
                                  np.asarray(b).view(np.uint16))
