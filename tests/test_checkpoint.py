"""Checkpoint/restart fidelity: bit-exact AB-history restart.

Mirrors the reference's tests/unit/test_ab_checkpoint.f90: run AB3 for a
few steps, checkpoint, restart into a SECOND case instance, continue both,
and compare to 1e-15."""

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.config import CheckpointConfig, StatsConfig
from x3d2_tpu.io.manager import IOManager


def make_case(tmp, time_intg="AB3"):
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg=time_intg, dt=1e-3)
    return TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)


def test_ab_checkpoint_bit_exact_restart(tmp_path):
    prefix = str(tmp_path / "ckpt")
    ck = CheckpointConfig(checkpoint_freq=5, checkpoint_prefix=prefix,
                          keep_checkpoint=True)

    # Reference run: 10 uninterrupted steps
    case_a = make_case(tmp_path)
    io_a = IOManager(case_a, ck, StatsConfig())
    state_a = case_a.run(n_iters=10, state=case_a.initial_state(),
                         n_output=10**9, io_manager=io_a)

    # Restart run: fresh case restores the step-5 checkpoint, runs 5 more
    case_b = make_case(tmp_path)
    ck2 = CheckpointConfig(restart_from_checkpoint=True,
                           restart_file=f"{prefix}_000005.npz",
                           checkpoint_prefix=prefix)
    io_b = IOManager(case_b, ck2, StatsConfig())
    state_b = io_b.handle_restart(case_b.initial_state())
    assert int(state_b["istep"]) == 6
    state_b = case_b.run(n_iters=5, state=state_b, n_output=10**9)

    for k in ("u", "v", "w"):
        d = np.max(np.abs(np.asarray(state_a[k]) - np.asarray(state_b[k])))
        assert d < 1e-15, (k, d)
    for oa, ob in zip(state_a["olds"], state_b["olds"]):
        assert np.max(np.abs(np.asarray(oa) - np.asarray(ob))) < 1e-15


def test_species_checkpoint_bit_exact_restart(tmp_path):
    """phi and its AB history restore bit-exactly (the reference saves
    species with the checkpoint state, checkpoint_manager.f90)."""
    prefix = str(tmp_path / "spk")
    ck = CheckpointConfig(checkpoint_freq=5, checkpoint_prefix=prefix,
                          keep_checkpoint=True)
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                          n_species=2, pr_species=(0.7, 1.0))

    def case():
        return TGVCase(mesh, params, dtype=jnp.float64,
                       monitor_path=None, verbose=False)

    case_a = case()
    io_a = IOManager(case_a, ck, StatsConfig())
    state_a = case_a.run(n_iters=10, state=case_a.initial_state(),
                         n_output=10**9, io_manager=io_a)

    case_b = case()
    ck2 = CheckpointConfig(restart_from_checkpoint=True,
                           restart_file=f"{prefix}_000005.npz",
                           checkpoint_prefix=prefix)
    io_b = IOManager(case_b, ck2, StatsConfig())
    state_b = io_b.handle_restart(case_b.initial_state())
    state_b = case_b.run(n_iters=5, state=state_b, n_output=10**9)

    for k in ("u", "v", "w", "phi"):
        d = np.max(np.abs(np.asarray(state_a[k]) - np.asarray(state_b[k])))
        assert d < 1e-15, (k, d)
    assert len(state_a["olds"]) == 4  # u,v,w,phi histories
    for oa, ob in zip(state_a["olds"], state_b["olds"]):
        assert np.max(np.abs(np.asarray(oa) - np.asarray(ob))) < 1e-15


def test_compensated_checkpoint_bit_exact_restart(tmp_path):
    """The Kahan compensation arrays are part of the state and must
    restore bit-exactly for the continued trajectory to match."""
    prefix = str(tmp_path / "kck")
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3,
                          compensated=True)

    def mk():
        return TGVCase(mesh, params, dtype=jnp.float32, monitor_path=None,
                       verbose=False)

    case_a = mk()
    ck = CheckpointConfig(checkpoint_freq=5, checkpoint_prefix=prefix,
                          keep_checkpoint=True)
    io_a = IOManager(case_a, ck, StatsConfig())
    state_a = case_a.run(n_iters=10, state=case_a.initial_state(),
                         n_output=10**9, io_manager=io_a)
    assert "comp" in state_a

    case_b = mk()
    ck2 = CheckpointConfig(restart_from_checkpoint=True,
                           restart_file=f"{prefix}_000005.npz",
                           checkpoint_prefix=prefix)
    io_b = IOManager(case_b, ck2, StatsConfig())
    state_b = io_b.handle_restart(case_b.initial_state())
    state_b = case_b.run(n_iters=5, state=state_b, n_output=10**9)

    for k in ("u", "v", "w"):
        d = np.max(np.abs(np.asarray(state_a[k]) - np.asarray(state_b[k])))
        assert d == 0.0, (k, d)
    for ca, cb in zip(state_a["comp"], state_b["comp"]):
        assert np.array_equal(np.asarray(ca), np.asarray(cb))


def test_checkpoint_cleanup_and_latest(tmp_path):
    prefix = str(tmp_path / "c")
    ck = CheckpointConfig(checkpoint_freq=2, checkpoint_prefix=prefix,
                          keep_checkpoint=False)
    case = make_case(tmp_path)
    io = IOManager(case, ck, StatsConfig())
    case.run(n_iters=6, state=case.initial_state(), n_output=10**9,
             io_manager=io)
    import glob
    files = glob.glob(f"{prefix}_*.npz")
    assert len(files) == 1  # only latest kept
    assert files[0].endswith("_000006.npz")


def test_stats_restore_through_restart(tmp_path):
    """Running statistics survive a checkpoint/restart cycle bit-exactly
    (reference restores stats on restart, checkpoint_manager.f90:346-501;
    accumulators per stats.f90:29-59). Accumulate 10 steps in run A with
    a checkpoint at step 5; run B restarts from it, accumulates the same
    5 further samples, and must land on identical accumulators."""
    prefix = str(tmp_path / "sck")
    stats_cfg = StatsConfig(initstat=1, istatfreq=1, istatout=0,
                            stats_prefix=str(tmp_path / "stats"))
    ck = CheckpointConfig(checkpoint_freq=5, checkpoint_prefix=prefix,
                          keep_checkpoint=True)

    case_a = make_case(tmp_path)
    io_a = IOManager(case_a, ck, stats_cfg)
    case_a.run(n_iters=10, state=case_a.initial_state(),
               n_output=10**9, io_manager=io_a)
    assert io_a.stats_mgr.sample_count == 10

    case_b = make_case(tmp_path)
    ck2 = CheckpointConfig(restart_from_checkpoint=True,
                           restart_file=f"{prefix}_000005.npz",
                           checkpoint_prefix=prefix)
    io_b = IOManager(case_b, ck2, stats_cfg)
    state_b = io_b.handle_restart(case_b.initial_state())
    # the restored accumulators carry the first 5 samples
    assert io_b.stats_mgr.sample_count == 5
    case_b.run(n_iters=5, state=state_b, n_output=10**9, io_manager=io_b)

    assert io_b.stats_mgr.sample_count == 10
    acc_a, acc_b = io_a.stats_mgr.acc, io_b.stats_mgr.acc
    assert set(acc_a) == set(acc_b)
    for k in acc_a:
        assert np.array_equal(np.asarray(acc_a[k]), np.asarray(acc_b[k])), k
