"""Snapshot manager: strided, optionally single-precision visualisation
output.

Parity with reference src/io/snapshot_manager.f90: field menu
u,v,w[,pressure,vort,qcrit,ibm,phi_N] (get_snapshot_fields:198-243),
spatial striding (output_stride), optional downcast (snapshot_sp), one
persistent store with appended steps. Alongside the .npz per step we write
a ParaView-readable VTK XML ImageData (.vti) file per step (the reference
emits a VTK-XML attribute for the ADIOS2VTXReader,
snapshot_manager.f90:245-285) plus a .pvd collection for time series.
"""

from __future__ import annotations

import base64
import os

import numpy as np

from . import native


class SnapshotManager:
    def __init__(self, case, config, verbose=True):
        self.case = case
        self.config = config
        self.verbose = verbose
        self.steps = []
        want = ["u", "v", "w"] + [f for f in config.output_fields if f]
        # 'species' expands to phi_1..phi_N (reference io_field_utils
        # species-name parsing, io_field_utils.f90:29-516)
        if "species" in want:
            want.remove("species")
            want += [f"phi_{i + 1}"
                     for i in range(case.params.n_species)]
        self.fields = want
        derived = [f for f in ("vort", "qcrit") if f in want]
        self._derived_fn = None
        if derived:
            from ..postprocess import make_derived_fields_fn
            self._derived_fn = make_derived_fields_fn(
                case.solver, case.dt, want=tuple(derived))
        os.makedirs(self._dir, exist_ok=True)

    @property
    def _dir(self):
        return f"{self.config.snapshot_prefix}_out"

    def should_snapshot(self, timestep) -> bool:
        f = self.config.snapshot_freq
        return f > 0 and timestep % f == 0

    def write(self, state, timestep, time):
        from ..parallel.multihost import gather_global, is_primary
        s = self.config.output_stride

        def stride(arr):
            arr = gather_global(arr)
            if self.config.snapshot_sp:
                # native strided downcast (C++ path, io/native.py)
                return native.pack_strided(arr, s)
            return arr[tuple(slice(None, None, max(1, int(st)))
                             for st in s)]

        data = {}
        for name in ("u", "v", "w"):
            if name in self.fields:
                data[name] = stride(state[name])
        if "pressure" in self.fields and "p" in state:
            from ..postprocess import pressure_vert
            pv = pressure_vert(self.case.solver, state["p"], self.case.dt)
            data["pressure"] = stride(pv)
        if self._derived_fn is not None:
            der = self._derived_fn(state["u"], state["v"], state["w"])
            for k, v in der.items():
                data[k] = stride(v)
        if "ibm" in self.fields and getattr(self.case, "ep", None) is not None:
            data["ibm"] = stride(self.case.ep)
        nphi = self.case.params.n_species
        for i in range(nphi):
            name = f"phi_{i + 1}"
            if name in self.fields or "species" in self.fields:
                data[name] = stride(state["phi"][i])

        path = os.path.join(self._dir, f"step_{timestep:06d}.npz")
        if not is_primary():
            return path
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, time=time, timestep=timestep, **data)
        os.replace(tmp, path)
        # stretched meshes need explicit per-axis coordinates: emit
        # RectilinearGrid (.vtr); uniform meshes keep the lighter .vti
        # (reference generate_vtk_xml, snapshot_manager.f90:245-285)
        if any(self.case.mesh.stretched):
            vtk = self._write_vtr(data, timestep)
        else:
            vtk = self._write_vti(data, timestep)
        self.steps.append((timestep, time, os.path.basename(vtk)))
        self._write_pvd()
        if self.verbose:
            print(f"Snapshot written: {path} fields={sorted(data)}")
        return path

    # -- minimal VTK XML writers (ParaView-compatible) -------------------
    def _write_vti(self, data, timestep):
        """VTK XML ImageData with inline base64 point data."""
        mesh = self.case.mesh
        s = self.config.output_stride
        path = os.path.join(self._dir, f"step_{timestep:06d}.vti")
        shape = next(iter(data.values())).shape
        nx, ny, nz = shape[:3]
        dx = [mesh.d[a] * s[a] for a in range(3)]
        arrays = []
        for name, arr in data.items():
            a32 = np.ascontiguousarray(
                np.transpose(arr, (2, 1, 0)), dtype=np.float32)  # VTK x-fast
            b64 = native.vtk_b64(a32)  # C++ encoder with python fallback
            arrays.append(
                f'<DataArray type="Float32" Name="{name}" '
                f'format="binary">{b64}</DataArray>')
        body = "\n".join(arrays)
        xml = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt32">
  <ImageData WholeExtent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}" Origin="0 0 0" Spacing="{dx[0]} {dx[1]} {dx[2]}">
    <Piece Extent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}">
      <PointData>
{body}
      </PointData>
    </Piece>
  </ImageData>
</VTKFile>
"""
        with open(path, "w") as fh:
            fh.write(xml)
        return path

    def _write_vtr(self, data, timestep):
        """VTK XML RectilinearGrid with the true (strided) vertex
        coordinates — required for stretched axes, where ImageData's
        uniform Spacing would misplace the clustered wall points."""
        mesh = self.case.mesh
        s = self.config.output_stride
        path = os.path.join(self._dir, f"step_{timestep:06d}.vtr")
        shape = next(iter(data.values())).shape
        nx, ny, nz = shape[:3]
        coords = []
        for a, n in enumerate((nx, ny, nz)):
            c = np.asarray(mesh.geo[a].vert_coords,
                           np.float32)[::max(1, int(s[a]))][:n]
            coords.append(
                f'<DataArray type="Float32" Name="{"XYZ"[a]}" '
                f'format="binary">{native.vtk_b64(np.ascontiguousarray(c))}'
                '</DataArray>')
        arrays = []
        for name, arr in data.items():
            a32 = np.ascontiguousarray(
                np.transpose(arr, (2, 1, 0)), dtype=np.float32)
            b64 = native.vtk_b64(a32)
            arrays.append(
                f'<DataArray type="Float32" Name="{name}" '
                f'format="binary">{b64}</DataArray>')
        ext = f"0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"
        xml = f"""<?xml version="1.0"?>
<VTKFile type="RectilinearGrid" version="1.0" byte_order="LittleEndian" header_type="UInt32">
  <RectilinearGrid WholeExtent="{ext}">
    <Piece Extent="{ext}">
      <Coordinates>
{coords[0]}
{coords[1]}
{coords[2]}
      </Coordinates>
      <PointData>
{chr(10).join(arrays)}
      </PointData>
    </Piece>
  </RectilinearGrid>
</VTKFile>
"""
        with open(path, "w") as fh:
            fh.write(xml)
        return path

    def _write_pvd(self):
        path = f"{self.config.snapshot_prefix}.pvd"
        rows = "\n".join(
            f'    <DataSet timestep="{t}" file="{self._dir}/{f}"/>'
            for _, t, f in self.steps)
        with open(path, "w") as fh:
            fh.write(f"""<?xml version="1.0"?>
<VTKFile type="Collection" version="0.1">
  <Collection>
{rows}
  </Collection>
</VTKFile>
""")
