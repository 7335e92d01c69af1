"""CLI end-to-end regression: python -m x3d2_tpu semantics (in-process,
tiny grid, full IO) — the xcompact.f90 main-program analogue."""

import os

from x3d2_tpu.__main__ import main


INPUT = """
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
n_iters = 4
n_output = 2
/End

&checkpoint_params
checkpoint_freq = 2
snapshot_freq = 4
keep_checkpoint = .true.
output_fields = 'vort'
snapshot_sp = .true.
/End
"""


def test_cli_tgv_full_io(tmp_path, capsys):
    os.chdir(tmp_path)
    inp = tmp_path / "input.x3d"
    inp.write_text(INPUT)
    main([str(inp), "--dtype", "f64"])
    out = capsys.readouterr().out
    assert "Flow case: tgv" in out
    assert os.path.exists(tmp_path / "checkpoint_000004.npz")
    assert os.path.exists(tmp_path / "snapshot_out" / "step_000004.vti")
    assert os.path.exists(tmp_path / "monitoring.csv")
    rows = open(tmp_path / "monitoring.csv").read().strip().splitlines()
    assert rows[0].startswith("time,enstrophy")
    assert len(rows) >= 3
    # restart from the written checkpoint
    inp2 = tmp_path / "input2.x3d"
    inp2.write_text(INPUT.replace("keep_checkpoint = .true.",
                                  "keep_checkpoint = .true.\n"
                                  "restart_from_checkpoint = .true."))
    main([str(inp2), "--dtype", "f64"])
    out2 = capsys.readouterr().out
    assert "Restart from" in out2


def test_cli_accepts_x_decomposition(tmp_path, capsys):
    """nproc_dir(1) > 1 (x-decomposition, reference mesh.f90:160-194)
    builds an (x, y, z) device mesh and runs the halo-operator path;
    the CLI prints a note that the Pallas fast paths gate off (x is
    the TPU lane/solve axis, so a 1 x NY x NZ layout stays preferred)."""
    os.chdir(tmp_path)
    inp = tmp_path / "input.x3d"
    inp.write_text(INPUT.replace("nproc_dir = 1, 1, 1",
                                 "nproc_dir = 2, 1, 1")
                   .replace("snapshot_freq = 4", "snapshot_freq = 0")
                   .replace("checkpoint_freq = 2", "checkpoint_freq = 0"))
    main([str(inp), "--dtype", "f64"])
    out = capsys.readouterr().out
    assert "x-decomposed mesh (2, 1, 1)" in out
    assert "Flow case: tgv" in out
    assert os.path.exists(tmp_path / "monitoring.csv")


def test_cli_honours_yz_nproc_dir(tmp_path, capsys):
    """A (y, z) decomposition request in the input file becomes the
    device mesh (the reference reads nproc_dir from the same namelist,
    xcompact.f90:69-74); --mesh still overrides."""
    os.chdir(tmp_path)
    inp = tmp_path / "input.x3d"
    inp.write_text(INPUT.replace("nproc_dir = 1, 1, 1",
                                 "nproc_dir = 1, 2, 2")
                   .replace("snapshot_freq = 4", "snapshot_freq = 0")
                   .replace("checkpoint_freq = 2", "checkpoint_freq = 0"))
    main([str(inp), "--dtype", "f64"])
    out = capsys.readouterr().out
    assert "Flow case: tgv" in out
    assert os.path.exists(tmp_path / "monitoring.csv")
