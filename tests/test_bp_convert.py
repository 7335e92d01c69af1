"""BP<->npz converter mapping logic (tools/bp_convert.py).

ADIOS2 is not present in this image, so the BP container I/O is
exercised through an injected in-memory stand-in implementing the same
3-method protocol (names/read/write) as the adios2-backed class; what
these tests certify is the NAME/LAYOUT mapping against the reference's
variable sets (checkpoint_manager.f90:151-345, stats.f90:189-292,
ibm.f90:43-146).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))

import bp_convert  # noqa: E402


class DictBP:
    """In-memory BP stand-in (same protocol as bp_convert.Adios2BP)."""

    def __init__(self, data=None):
        self.data = dict(data or {})

    def names(self):
        return list(self.data)

    def read(self, name):
        return self.data[name]

    def write(self, name, arr):
        self.data[name] = np.asarray(arr)

    def close(self):
        pass


def _state(shape=(6, 5, 4), nolds=2, seed=0):
    rng = np.random.default_rng(seed)
    z = {k: rng.standard_normal(shape) for k in ("u", "v", "w")}
    for i in range(3):
        z[f"olds_{i}"] = rng.standard_normal((nolds,) + shape)
    z["n_olds_vars"] = np.asarray(3)
    z["timestep"] = np.asarray(7)
    z["time"] = np.asarray(0.7)
    z["dt"] = np.asarray(0.1)
    return z


def test_checkpoint_roundtrip():
    z = _state()
    bp = DictBP()
    bp_convert.checkpoint_npz_to_bp(z, bp)
    # the reference's variable set is present
    for nm in ("u", "v", "w", "timestep", "time", "dt", "data_loc",
               "ti_is_ab", "ti_order", "ti_istep", "ti_nstep",
               "u_rhs_old1_rank000000", "w_rhs_old2_rank000000"):
        assert nm in bp.data, nm
    assert int(bp.data["data_loc"]) == 0        # VERT, common.f90:29
    assert int(bp.data["ti_is_ab"]) == 1
    assert int(bp.data["ti_order"]) == 3        # nolds=2 -> AB3

    back = bp_convert.checkpoint_bp_to_npz(bp)
    for k in ("u", "v", "w"):
        np.testing.assert_array_equal(back[k], z[k])
    for i in range(3):
        np.testing.assert_array_equal(back[f"olds_{i}"], z[f"olds_{i}"])
    assert int(back["timestep"]) == 7
    assert float(back["dt"]) == 0.1


def test_checkpoint_reverse_axes_is_involutive():
    z = _state(shape=(6, 5, 4))
    bp = DictBP()
    bp_convert.checkpoint_npz_to_bp(z, bp, reverse_axes=True)
    assert bp.data["u"].shape == (4, 5, 6)
    back = bp_convert.checkpoint_bp_to_npz(bp, reverse_axes=True)
    np.testing.assert_array_equal(back["u"], z["u"])
    np.testing.assert_array_equal(back["olds_1"], z["olds_1"])


def test_checkpoint_multirank_history_dropped(capsys):
    z = _state()
    bp = DictBP()
    bp_convert.checkpoint_npz_to_bp(z, bp)
    # a second rank's history appears -> reassembly is not possible from
    # names alone; mapping falls back to the reference's own zero-fill
    # semantics (checkpoint_manager.f90:459-489)
    bp.data["u_rhs_old1_rank000001"] = bp.data["u_rhs_old1_rank000000"]
    back = bp_convert.checkpoint_bp_to_npz(bp)
    assert not any(k.startswith("olds_") for k in back)
    for k in ("u", "v", "w"):          # fields themselves still transfer
        np.testing.assert_array_equal(back[k], z[k])


def test_stats_roundtrip_names_match_reference():
    rng = np.random.default_rng(1)
    stats = {nm: rng.standard_normal((4, 3, 2)) for nm in
             ("umean", "vmean", "wmean", "uprime", "vprime", "wprime",
              "uvmean", "uwmean", "vwmean", "pmean")}
    stats["sample_count"] = np.asarray(12)
    bp = DictBP()
    bp_convert.stats_npz_to_bp(stats, bp)
    assert set(bp.names()) == set(stats)   # stats.f90:245-269 names
    back = bp_convert.stats_bp_to_npz(bp)
    for k in stats:
        np.testing.assert_array_equal(back[k], stats[k])


def test_ibm_roundtrip_and_gate():
    mask = (np.arange(24).reshape(4, 3, 2) % 3 == 0).astype(np.float64)
    bp = DictBP()
    bp_convert.ibm_npy_to_bp(mask, bp)
    assert int(bp.data["iibm"]) == 1
    np.testing.assert_array_equal(bp_convert.ibm_bp_to_npy(bp), mask)

    bp.data["iibm"] = np.asarray(2)
    try:
        bp_convert.ibm_bp_to_npy(bp)
    except SystemExit as e:
        assert "iibm=2" in str(e)
    else:
        raise AssertionError("iibm != 1 must be rejected")
