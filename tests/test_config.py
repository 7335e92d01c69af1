"""Config parser tests: the reference's own example input files must parse
(namelist-format parity, reference examples/*/input.x3d)."""

import os

import pytest

from x3d2_tpu.config import Config

REF = "/root/reference/examples"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_tgv_example():
    cfg = Config.from_file(f"{REF}/TGV/input.x3d")
    assert cfg.domain.flow_case_name == "tgv"
    assert tuple(cfg.domain.dims_global) == (256, 256, 256)
    assert abs(cfg.domain.L_global[0] - 6.283185307179586) < 1e-12
    assert cfg.domain.BC_x == ("periodic", "periodic")
    assert cfg.solver.Re == 1600.0
    assert cfg.solver.time_intg == "AB3"
    assert cfg.solver.dt == 0.001
    assert cfg.solver.n_iters == 20000
    assert cfg.solver.der1st_scheme == "compact6"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_channel_example():
    cfg = Config.from_file(f"{REF}/channel/input.x3d")
    assert cfg.domain.flow_case_name == "channel"
    assert tuple(cfg.domain.dims_global) == (128, 65, 64)
    assert cfg.domain.BC_y == ("dirichlet", "dirichlet")
    assert cfg.domain.stretching[1] != "uniform"
    assert cfg.channel is not None
    assert cfg.solver.time_intg == "RK3"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_cylinder_example():
    cfg = Config.from_file(f"{REF}/cylinder/input.x3d")
    assert cfg.domain.flow_case_name == "cylinder"
    assert cfg.solver.ibm_on is True
    assert cfg.cylinder is not None
    assert cfg.checkpoint.snapshot_freq > 0


def test_parse_string_with_defaults():
    cfg = Config.from_string("""
&domain_settings
flow_case_name = 'tgv'
L_global = 1d0, 2d0, 3d0
dims_global = 8, 8, 8
nproc_dir = 1, 1, 1
BC_x = 'periodic', 'periodic'
BC_y = 'periodic', 'periodic'
BC_z = 'periodic', 'periodic'
/End

&solver_params
Re = 100d0
time_intg = 'RK2'
dt = 0.01d0
n_iters = 5
n_output = 1
/End
""")
    assert cfg.domain.L_global == (1.0, 2.0, 3.0)
    assert cfg.solver.time_intg == "RK2"
    # defaults preserved for unspecified keys
    assert cfg.solver.der1st_scheme == "compact6"
    assert cfg.checkpoint.checkpoint_freq == 0


def test_parse_indexed_species_entries():
    """Fortran indexed assignment into the defaulted pr_species array
    (reference config.f90:161,194-195): pr_species defaults to 1.0 and
    is truncated to n_species."""
    from x3d2_tpu.config import Config
    cfg = Config.from_string("""
&domain_settings
flow_case_name = 'tgv'
L_global = 1d0, 1d0, 1d0
dims_global = 8, 8, 8
BC_x = 'periodic', 'periodic'
BC_y = 'periodic', 'periodic'
BC_z = 'periodic', 'periodic'
/End

&solver_params
Re = 100d0
time_intg = 'AB3'
dt = 0.01d0
n_iters = 5
n_output = 1
n_species = 3
pr_species(1) = 0.7d0
pr_species(3) = 0.9d0
/End
""")
    assert cfg.solver.n_species == 3
    # index 2 left at the reference default 1.0
    assert cfg.solver.pr_species == (0.7, 1.0, 0.9)


def test_parse_tgv_species_example():
    import os
    here = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "TGV_species", "input.x3d")
    from x3d2_tpu.config import Config
    cfg = Config.from_file(here)
    assert cfg.solver.n_species == 2
    assert cfg.solver.pr_species == (0.7, 1.0)
