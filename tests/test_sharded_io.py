"""Sharded IO round-trips: a checkpoint written from a sharded run must
restore bit-exactly onto a DIFFERENT mesh shape (and onto a single
device) and continue identically — the logically-global npz layout's
sharding-agnosticism claim (io/checkpoint.py docstring; reference
tests/unit/test_ab_checkpoint.f90:16-44 is the single-layout analogue).
Also covers the CLI --mesh path end-to-end."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.config import CheckpointConfig, StatsConfig
from x3d2_tpu.io.manager import IOManager
from x3d2_tpu.parallel import make_device_mesh, make_sharded_step, shard_state


def cpu_devices():
    return jax.devices("cpu")


def _case(tmp_path, restart=False):
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    ck = CheckpointConfig(checkpoint_freq=2, keep_checkpoint=True,
                          checkpoint_prefix=str(tmp_path / "ckpt"),
                          restart_from_checkpoint=restart)
    return case, IOManager(case, ck, StatsConfig())


def test_sharded_checkpoint_restores_across_mesh_shapes(tmp_path):
    devices = cpu_devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    case, io = _case(tmp_path)

    # run 2 steps sharded on a 2x4 mesh, checkpointing at step 2
    dmesh_a = make_device_mesh(2, 4, devices=devices)
    step_a, state = make_sharded_step(case, dmesh_a)
    state = case.run(n_iters=2, state=state, n_output=10**9, io_manager=io)
    assert os.path.exists(tmp_path / "ckpt_000002.npz")

    # continue 2 more steps on the same mesh -> reference trajectory
    ref = state
    for _ in range(2):
        ref = step_a(ref)

    # restore onto a 4x2 mesh and continue
    case_b, io_b = _case(tmp_path, restart=True)
    dmesh_b = make_device_mesh(4, 2, devices=devices)
    step_b, init_b = make_sharded_step(case_b, dmesh_b)
    restored = io_b.handle_restart(jax.device_get(init_b))
    restored = shard_state(dmesh_b, restored)
    out_b = restored
    for _ in range(2):
        out_b = step_b(out_b)

    # restore onto a single device and continue
    case_c, io_c = _case(tmp_path, restart=True)
    restored_c = io_c.handle_restart(case_c.initial_state())
    out_c = restored_c
    for _ in range(2):
        out_c = case_c._step(out_c)

    for k in ("u", "v", "w"):
        a = np.asarray(ref[k])
        assert np.max(np.abs(a - np.asarray(out_b[k]))) < 1e-15, (k, "4x2")
        assert np.max(np.abs(a - np.asarray(out_c[k]))) < 1e-15, (k, "1dev")
    # AB history restored bit-exactly too
    for oa, ob in zip(ref["olds"], out_b["olds"]):
        for a_, b_ in zip(oa, ob):
            assert np.max(np.abs(np.asarray(a_) - np.asarray(b_))) < 1e-15


CLI_INPUT = """
&domain_settings
flow_case_name = 'tgv'
L_global = 6.283185307179586d0, 6.283185307179586d0, 6.283185307179586d0
dims_global = 16, 16, 16
nproc_dir = 1, 1, 1
BC_x = 'periodic', 'periodic'
BC_y = 'periodic', 'periodic'
BC_z = 'periodic', 'periodic'
/End

&solver_params
Re = 1600d0
time_intg = 'AB2'
dt = 0.01d0
n_iters = 2
n_output = 1
/End

&checkpoint_params
checkpoint_freq = 2
keep_checkpoint = .true.
/End
"""


def test_cli_mesh_flag_matches_single_device(tmp_path, capsys):
    """python -m x3d2_tpu input.x3d --mesh 2 2 must produce the same
    monitoring series and checkpoint as the unsharded run."""
    if len(cpu_devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from x3d2_tpu.__main__ import main
    os.chdir(tmp_path)
    inp = tmp_path / "input.x3d"
    inp.write_text(CLI_INPUT)

    os.makedirs("single", exist_ok=True)
    os.chdir(tmp_path / "single")
    main([str(inp), "--dtype", "f64"])
    os.chdir(tmp_path)
    os.makedirs("sharded", exist_ok=True)
    os.chdir(tmp_path / "sharded")
    main([str(inp), "--dtype", "f64", "--mesh", "2", "2"])
    capsys.readouterr()

    za = np.load(tmp_path / "single" / "checkpoint_000002.npz")
    zb = np.load(tmp_path / "sharded" / "checkpoint_000002.npz")
    for k in ("u", "v", "w"):
        assert np.max(np.abs(za[k] - zb[k])) < 1e-13, k
    ma = open(tmp_path / "single" / "monitoring.csv").read()
    mb = open(tmp_path / "sharded" / "monitoring.csv").read()
    assert ma.splitlines()[0] == mb.splitlines()[0]
    a = np.loadtxt(ma.splitlines()[1:], delimiter=",", ndmin=2)
    b = np.loadtxt(mb.splitlines()[1:], delimiter=",", ndmin=2)
    assert np.allclose(a, b, atol=1e-12)


def test_per_shard_checkpoint_roundtrip_no_global_gather(tmp_path):
    """Per-shard checkpoint format (io/sharded.py): writing never
    gathers a global field (gather_global is poisoned), each process
    writes only its addressable chunks, and the checkpoint restores
    bit-exactly onto a DIFFERENT mesh shape and onto a single device."""
    devices = cpu_devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")

    def _scase(restart=False):
        mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                    ((BC.PERIODIC, BC.PERIODIC),) * 3)
        params = SolverParams(Re=1600.0, time_intg="AB3", dt=1e-3)
        case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                       verbose=False)
        ck = CheckpointConfig(checkpoint_freq=2, keep_checkpoint=True,
                              checkpoint_prefix=str(tmp_path / "sck"),
                              restart_from_checkpoint=restart,
                              sharded_io=True)
        return case, IOManager(case, ck, StatsConfig())

    case, io = _scase()
    dmesh_a = make_device_mesh(2, 4, devices=devices)
    step_a, state = make_sharded_step(case, dmesh_a)

    from x3d2_tpu.parallel import multihost

    def poisoned(x):
        raise AssertionError("sharded checkpoint path gathered a "
                             "global field")

    orig = multihost.gather_global
    multihost.gather_global = poisoned
    try:
        state = case.run(n_iters=2, state=state, n_output=10**9,
                         io_manager=io)
    finally:
        multihost.gather_global = orig
    manifest = tmp_path / "sck_000002.manifest.npz"
    shardfile = tmp_path / "sck_000002.shards0000.npz"
    assert os.path.exists(manifest) and os.path.exists(shardfile)
    # chunks are genuinely per-shard: no chunk spans the full y extent
    z = np.load(shardfile)
    ukeys = [k for k in z.files if k.startswith("u@")]
    assert len(ukeys) == 8 and all(z[k].shape[1] == 8 for k in ukeys)

    ref = state
    for _ in range(2):
        ref = step_a(ref)

    # restore onto a 4x2 mesh, sharded template (shard-local reads)
    case_b, io_b = _scase(restart=True)
    dmesh_b = make_device_mesh(4, 2, devices=devices)
    step_b, init_b = make_sharded_step(case_b, dmesh_b)
    restored = io_b.handle_restart(init_b)
    assert restored["u"].sharding.is_equivalent_to(
        init_b["u"].sharding, restored["u"].ndim)
    out_b = restored
    for _ in range(2):
        out_b = step_b(out_b)

    # restore onto a single device
    case_c, io_c = _scase(restart=True)
    out_c = io_c.handle_restart(case_c.initial_state())
    for _ in range(2):
        out_c = case_c._step(out_c)

    for k in ("u", "v", "w"):
        a = np.asarray(ref[k])
        assert np.max(np.abs(a - np.asarray(out_b[k]))) < 1e-15, (k, "4x2")
        assert np.max(np.abs(a - np.asarray(out_c[k]))) < 1e-15, (k, "1dev")
    for oa, ob in zip(ref["olds"], out_b["olds"]):
        for a_, b_ in zip(oa, ob):
            assert np.max(np.abs(np.asarray(a_) - np.asarray(b_))) < 1e-15
