#!/usr/bin/env python
"""Convert between the reference's ADIOS2/BP artifacts and this repo's
npz/npy formats (checkpoints, statistics, IBM masks).

The reference writes BP5 via ADIOS2 (src/io/adios2/io.f90) with these
layouts:

  checkpoint (checkpoint_manager.f90:151-345):
    scalars  timestep, time, dt, data_loc (VERT=0),
             ti_is_ab, ti_order, ti_istep, ti_nstep
    fields   u, v, w              (global 3-D arrays)
    history  {u,v,w}_rhs_old{j}_rank{r:06d}   per-rank AB derivative
             history, j = 1..nolds (checkpoint_manager.f90:222-283); on
             restore the reference zero-fills first and tolerates
             missing history (checkpoint_manager.f90:459-489)
  statistics (stats.f90:189-292):
    sample_count + umean/vmean/wmean, uprime/vprime/wprime,
    uvmean/uwmean/vwmean [, pmean, phimean_N, phiprime_N] — the SAME
    names this repo's StatsManager.write emits in its npz
  IBM mask (module/ibm.f90:43-146):
    scalar iibm (1 = basic), field ep1 (VERT dims; "written in python
    in C order", read axis-reversed by the Fortran side)

This repo's formats: CheckpointManager npz (io/checkpoint.py:66-99 —
u/v/w[/phi]/key, stacked olds_{i}, n_olds_vars, timestep/time/dt,
stats_*), StatsManager npz (io/stats.py:93-124), ibm .npy mask
(ibm.py).

ADIOS2 itself is NOT bundled in this image (zero-egress environment);
the BP file I/O is delegated to the `adios2` Python package exactly as
the reference delegates to libadios2 — install it where interop is
needed. All name/layout mapping logic below is adios2-free and unit
tested with an injected in-memory BP stand-in
(tests/test_bp_convert.py).

Usage:
  python tools/bp_convert.py checkpoint bp2npz in.bp out.npz [--reverse-axes]
  python tools/bp_convert.py checkpoint npz2bp in.npz out.bp [--reverse-axes]
  python tools/bp_convert.py stats      bp2npz in.bp out.npz
  python tools/bp_convert.py stats      npz2bp in.npz out.bp
  python tools/bp_convert.py ibm        bp2npy in.bp out.npy
  python tools/bp_convert.py ibm        npy2bp in.npy out.bp

--reverse-axes transposes every 3-D field (x,y,z)<->(z,y,x): the
reference stores Fortran-order globals while this repo stores C-order
(x,y,z); whether a transpose is needed depends on which adios2 binding
wrote the file (the reference's own IBM reader reverses the dims of
python-written masks, ibm.f90:112-123).
"""

from __future__ import annotations

import re
import sys

import numpy as np

VERT = 0  # reference common.f90:29


# ---------------------------------------------------------------------------
# BP file access: a minimal reader/writer protocol. The real
# implementation wraps adios2's Stream API; tests inject a dict-backed
# stand-in with the same three methods.
# ---------------------------------------------------------------------------
class Adios2BP:
    """BP5 file via the adios2 python bindings (required at runtime)."""

    def __init__(self, path, mode):
        try:
            import adios2
        except ImportError as e:  # pragma: no cover - environment gate
            raise SystemExit(
                "bp_convert needs the `adios2` python package to touch "
                ".bp files (pip install adios2); the mapping logic is "
                "testable without it — see tests/test_bp_convert.py"
            ) from e
        self._stream = adios2.Stream(path, mode)
        self._mode = mode

    def names(self):
        return list(self._stream.available_variables().keys())

    def read(self, name):
        return np.asarray(self._stream.read(name))

    def write(self, name, arr):
        arr = np.asarray(arr)
        if arr.ndim == 0:
            self._stream.write(name, arr)
        else:
            self._stream.write(name, np.ascontiguousarray(arr),
                               list(arr.shape), [0] * arr.ndim,
                               list(arr.shape))

    def close(self):
        self._stream.close()


def _rev(arr, reverse_axes):
    arr = np.asarray(arr)
    return arr.transpose(2, 1, 0) if (reverse_axes and arr.ndim == 3) \
        else arr


# ---------------------------------------------------------------------------
# checkpoint mapping
# ---------------------------------------------------------------------------
_OLD_RE = re.compile(r"^([uvw])_rhs_old(\d+)_rank(\d+)$")


def checkpoint_bp_to_npz(bp, reverse_axes=False):
    """Reference checkpoint BP -> repo CheckpointManager npz dict."""
    names = set(bp.names())
    out = {}
    for k in ("u", "v", "w"):
        out[k] = _rev(bp.read(k), reverse_axes)
    for src, dst in (("timestep", "timestep"), ("time", "time"),
                     ("dt", "dt")):
        if src in names:
            out[dst] = np.asarray(bp.read(src))
    # AB derivative history: per-rank variables; a single-rank write
    # reassembles exactly, multi-rank history is dropped (the reference
    # itself zero-fills missing history on restore,
    # checkpoint_manager.f90:459-489, and this repo's restore treats
    # absent olds_{i} the same way)
    olds = {}
    multirank = False
    for nm in names:
        m = _OLD_RE.match(nm)
        if not m:
            continue
        f, j, r = m.group(1), int(m.group(2)), int(m.group(3))
        if r != 0:
            multirank = True
            continue
        olds.setdefault(f, {})[j] = _rev(bp.read(nm), reverse_axes)
    if multirank:
        print("warning: multi-rank *_rhs_old* history dropped "
              "(restart re-bootstraps the AB startup ramp, matching the "
              "reference's zero-fill fallback)", file=sys.stderr)
        olds = {}
    if olds:
        for i, f in enumerate("uvw"):
            js = sorted(olds.get(f, {}))
            if js:
                out[f"olds_{i}"] = np.stack([olds[f][j] for j in js])
        out["n_olds_vars"] = np.asarray(3)
    return out


def checkpoint_npz_to_bp(z, bp, reverse_axes=False):
    """Repo checkpoint npz mapping -> reference BP variable set."""
    for k in ("u", "v", "w"):
        bp.write(k, _rev(z[k], reverse_axes))
    timestep = int(np.asarray(z["timestep"]))
    bp.write("timestep", np.asarray(timestep))
    bp.write("time", np.asarray(float(np.asarray(z["time"]))))
    bp.write("dt", np.asarray(float(np.asarray(z["dt"]))))
    bp.write("data_loc", np.asarray(VERT))
    n_olds = 0
    for i, f in enumerate("uvw"):
        key = f"olds_{i}"
        if key in z and np.asarray(z[key]).ndim == 4:
            hist = np.asarray(z[key], np.float64)
            n_olds = hist.shape[0]
            for j in range(n_olds):
                bp.write(f"{f}_rhs_old{j + 1}_rank{0:06d}",
                         _rev(hist[j], reverse_axes))
    # time-integrator scalars (checkpoint_manager.f90:204-212)
    bp.write("ti_is_ab", np.asarray(1 if n_olds else 0))
    bp.write("ti_order", np.asarray(n_olds + 1 if n_olds else 0))
    bp.write("ti_istep", np.asarray(timestep))
    bp.write("ti_nstep", np.asarray(min(timestep, n_olds + 1)
                                    if n_olds else 0))


# ---------------------------------------------------------------------------
# statistics: names already coincide (repo StatsManager.write mirrors
# stats.f90's write_stats), so the mapping is a straight transfer.
# ---------------------------------------------------------------------------
def stats_bp_to_npz(bp):
    return {nm: np.asarray(bp.read(nm)) for nm in bp.names()}


def stats_npz_to_bp(z, bp):
    for nm in sorted(z):
        bp.write(nm, np.asarray(z[nm]))


# ---------------------------------------------------------------------------
# IBM mask
# ---------------------------------------------------------------------------
def ibm_bp_to_npy(bp):
    """ibm_XYZ.bp -> boolean/float vertex mask (repo ibm.py format).

    The reference requires iibm == 1 (basic) and reads ep1 with the
    dims reversed relative to the python writer (ibm.f90:105-123); the
    repo's .npy mask is (nx,ny,nz) C-order, which matches the python
    writer's layout, so NO transpose is applied here."""
    iibm = int(np.asarray(bp.read("iibm")))
    if iibm != 1:
        raise SystemExit(f"unsupported iibm={iibm} (only basic IBM, =1)")
    return np.asarray(bp.read("ep1"))


def ibm_npy_to_bp(mask, bp):
    bp.write("iibm", np.asarray(1, np.int64))
    bp.write("ep1", np.asarray(mask, np.float64))


# ---------------------------------------------------------------------------
def main(argv):
    if len(argv) < 4:
        print(__doc__)
        return 2
    kind, direction, src, dst = argv[0], argv[1], argv[2], argv[3]
    reverse = "--reverse-axes" in argv[4:]
    if kind == "checkpoint" and direction == "bp2npz":
        bp = Adios2BP(src, "r")
        arrays = checkpoint_bp_to_npz(bp, reverse)
        bp.close()
        np.savez(dst, **arrays)
    elif kind == "checkpoint" and direction == "npz2bp":
        with np.load(src) as z:
            bp = Adios2BP(dst, "w")
            checkpoint_npz_to_bp(z, bp, reverse)
            bp.close()
    elif kind == "stats" and direction == "bp2npz":
        bp = Adios2BP(src, "r")
        arrays = stats_bp_to_npz(bp)
        bp.close()
        np.savez(dst, **arrays)
    elif kind == "stats" and direction == "npz2bp":
        with np.load(src) as z:
            bp = Adios2BP(dst, "w")
            stats_npz_to_bp(z, bp)
            bp.close()
    elif kind == "ibm" and direction == "bp2npy":
        bp = Adios2BP(src, "r")
        np.save(dst, ibm_bp_to_npy(bp))
        bp.close()
    elif kind == "ibm" and direction == "npy2bp":
        bp = Adios2BP(dst, "w")
        ibm_npy_to_bp(np.load(src), bp)
        bp.close()
    else:
        print(f"unknown conversion {kind} {direction}\n{__doc__}")
        return 2
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
