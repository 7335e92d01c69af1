"""Snapshot manager: strided/f32 output, VTK VTI encoding (native C++ path
with Python fallback), PVD collection, stats writing."""

import base64
import os
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pytest
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.mesh import Mesh
from x3d2_tpu.cases import SolverParams, TGVCase
from x3d2_tpu.config import CheckpointConfig, StatsConfig
from x3d2_tpu.io.manager import IOManager
from x3d2_tpu.io import native


def test_native_helpers_match_python():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(33, 17, 24))
    for arr in (a.astype(np.float32), a):
        got = native.pack_strided(arr, (2, 3, 2))
        ref = np.asarray(arr[::2, ::3, ::2], np.float32)
        assert np.array_equal(got, ref)
    data = rng.normal(size=1000).astype(np.float32)
    raw = data.tobytes()
    ref = base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()
    assert native.vtk_b64(data) == ref


def test_snapshot_vti_and_pvd(tmp_path):
    os.chdir(tmp_path)
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB2", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    ck = CheckpointConfig(snapshot_freq=2,
                          snapshot_prefix=str(tmp_path / "snap"),
                          output_stride=(2, 2, 2), snapshot_sp=True,
                          output_fields=("vort", "qcrit", "pressure"))
    io = IOManager(case, ck, StatsConfig())
    case.run(n_iters=4, state=case.initial_state(), n_output=10**9,
             io_manager=io)

    d = str(tmp_path / "snap_out")
    files = sorted(os.listdir(d))
    assert "step_000002.npz" in files and "step_000004.vti" in files

    z = np.load(os.path.join(d, "step_000004.npz"))
    assert set(z.files) >= {"u", "v", "w", "vort", "qcrit", "pressure",
                            "time", "timestep"}
    assert z["u"].shape == (8, 8, 8)
    assert z["u"].dtype == np.float32

    # VTI payloads decode to exactly the npz data
    tree = ET.parse(os.path.join(d, "step_000004.vti"))
    for da in tree.getroot().findall(".//DataArray"):
        raw = base64.b64decode(da.text.strip())
        n = struct.unpack("<I", raw[:4])[0]
        arr = np.frombuffer(raw[4:4 + n], np.float32)
        ref = np.transpose(z[da.get("Name")], (2, 1, 0)).ravel()
        assert np.array_equal(arr, ref), da.get("Name")

    # PVD collection references both steps
    pvd = open(str(tmp_path / "snap.pvd")).read()
    assert "step_000002.vti" in pvd and "step_000004.vti" in pvd


def test_snapshot_vtr_for_stretched_mesh(tmp_path):
    """Stretched-y channel snapshots must be RectilinearGrid (.vtr) with
    the true clustered wall coordinates — ImageData's uniform Spacing
    would misplace them (reference snapshot_manager.f90:245-285)."""
    os.chdir(tmp_path)
    from x3d2_tpu.cases import ChannelCase
    from x3d2_tpu.config import ChannelConfig
    mesh = Mesh((16, 17, 16), (4.0, 2.0, 2.0),
                ((BC.PERIODIC, BC.PERIODIC),
                 (BC.DIRICHLET, BC.DIRICHLET),
                 (BC.PERIODIC, BC.PERIODIC)),
                stretching=("uniform", "top-bottom", "uniform"),
                beta=(0.0, 0.259, 0.0))
    params = SolverParams(Re=4200.0, time_intg="RK2", dt=1e-3)
    case = ChannelCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                       verbose=False,
                       case_cfg=ChannelConfig(init_noise=(0.0, 0.0, 0.0)))
    ck = CheckpointConfig(snapshot_freq=1,
                          snapshot_prefix=str(tmp_path / "chan"),
                          output_stride=(1, 1, 1))
    io = IOManager(case, ck, StatsConfig())
    case.run(n_iters=1, state=case.initial_state(), n_output=10**9,
             io_manager=io)
    d = str(tmp_path / "chan_out")
    files = os.listdir(d)
    assert "step_000001.vtr" in files
    assert not any(f.endswith(".vti") for f in files)

    tree = ET.parse(os.path.join(d, "step_000001.vtr"))
    root = tree.getroot()
    assert root.get("type") == "RectilinearGrid"
    coords = {da.get("Name"): da.text
              for da in root.findall(".//Coordinates/DataArray")}
    raw = base64.b64decode(coords["Y"].strip())
    n = struct.unpack("<I", raw[:4])[0]
    y = np.frombuffer(raw[4:4 + n], np.float32)
    assert np.allclose(y, np.asarray(mesh.geo[1].vert_coords, np.float32))
    # clustered: wall spacing much smaller than centre spacing
    dy = np.diff(y)
    assert dy[0] < 0.5 * dy[len(dy) // 2]
    # PVD points at the vtr
    assert "step_000001.vtr" in open(str(tmp_path / "chan.pvd")).read()


def test_snapshot_reader_roundtrip(tmp_path):
    """Snapshot store -> SnapshotReader -> arrays (the reference's
    reader_session_t role, io_session.f90:57): iteration order, lazy
    field access, per-step metadata, and series stacking all come back
    exactly as written — no hand-globbing of step files."""
    os.chdir(tmp_path)
    mesh = Mesh((16, 16, 16), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB2", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    ck = CheckpointConfig(snapshot_freq=2,
                          snapshot_prefix=str(tmp_path / "snap"),
                          output_stride=(1, 1, 1), snapshot_sp=True)
    io = IOManager(case, ck, StatsConfig())
    case.run(n_iters=4, state=case.initial_state(), n_output=10**9,
             io_manager=io)

    from x3d2_tpu.io.reader import SnapshotReader
    with SnapshotReader(str(tmp_path / "snap")) as r:
        assert r.timesteps == [2, 4]
        assert len(r) == 2
        assert set(r.fields()) == {"u", "v", "w"}
        times = [s.time for s in r]
        assert times == pytest.approx([2e-3, 4e-3])
        # read-back equals the raw archive bit-for-bit
        raw = np.load(str(tmp_path / "snap_out" / "step_000004.npz"))
        assert np.array_equal(r.read(4, "u"), raw["u"])
        assert "u" in r.step(2) and "pressure" not in r.step(2)
        series = r.series("w")
        assert series.shape == (2, 16, 16, 16)
        assert np.array_equal(series[1], raw["w"])
        with pytest.raises(KeyError):
            r.read(3, "u")
        with pytest.raises(KeyError):
            r.step(2)["time"]


def test_stats_reader(tmp_path):
    """StatsReader returns the latest Welford archive as plain arrays."""
    os.chdir(tmp_path)
    mesh = Mesh((12, 12, 12), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB1", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    st = StatsConfig(initstat=1, istatfreq=1, istatout=2,
                     stats_prefix=str(tmp_path / "stats"))
    io = IOManager(case, CheckpointConfig(), st)
    case.run(n_iters=4, state=case.initial_state(), n_output=10**9,
             io_manager=io)
    from x3d2_tpu.io.reader import StatsReader
    r = StatsReader(str(tmp_path / "stats"))
    assert r.timesteps == [2, 4]
    latest = r.latest()
    assert int(latest["sample_count"]) == 4
    ref = np.load(str(tmp_path / "stats_000004.npz"))
    assert np.array_equal(latest["umean"], ref["umean"])


def test_stats_written_with_derived(tmp_path):
    os.chdir(tmp_path)
    mesh = Mesh((12, 12, 12), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="AB1", dt=1e-3)
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False)
    st = StatsConfig(initstat=1, istatfreq=1, istatout=4,
                     stats_prefix=str(tmp_path / "stats"))
    io = IOManager(case, CheckpointConfig(), st)
    case.run(n_iters=4, state=case.initial_state(), n_output=10**9,
             io_manager=io)
    z = np.load(str(tmp_path / "stats_000004.npz"))
    assert set(z.files) >= {"umean", "vmean", "wmean", "uprime", "vprime",
                            "wprime", "uvmean", "uwmean", "vwmean",
                            "sample_count"}
    assert int(z["sample_count"]) == 4
    # u' >= 0 everywhere; umean finite
    assert (z["uprime"] >= 0).all()
    assert np.isfinite(z["umean"]).all()


def test_stats_pressure_and_species_moments(tmp_path):
    """Pressure mean (keep_pressure) and species moments
    (reference stats.f90:44-50)."""
    os.chdir(tmp_path)
    mesh = Mesh((12, 12, 12), (2 * np.pi,) * 3,
                ((BC.PERIODIC, BC.PERIODIC),) * 3)
    params = SolverParams(Re=1600.0, time_intg="RK2", dt=1e-3,
                          n_species=1, pr_species=(1.0,))
    case = TGVCase(mesh, params, dtype=jnp.float64, monitor_path=None,
                   verbose=False, keep_pressure=True)
    st = StatsConfig(initstat=1, istatfreq=1, istatout=3,
                     stats_prefix=str(tmp_path / "sp"))
    io = IOManager(case, CheckpointConfig(), st)
    case.run(n_iters=3, state=case.initial_state(), n_output=10**9,
             io_manager=io)
    z = np.load(str(tmp_path / "sp_000003.npz"))
    assert {"pmean", "phimean", "phiprime"} <= set(z.files)
    assert z["phimean"].shape[0] == 1  # one species
    assert np.isfinite(z["pmean"]).all()
    assert (z["phiprime"] >= 0).all()
