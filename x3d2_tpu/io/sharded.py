"""Per-shard checkpoint IO: no global field ever materialises on one host.

The reference writes raw per-rank blocks for exactly this reason
(checkpoint_manager.f90:223-283 "_rankNNNNNN" arrays): at scale, a
root-gathered global field is the first thing that stops fitting. Here
every process writes only its ADDRESSABLE shards (chunk arrays keyed by
their global offsets) to its own `.shardsNNNN.npz`, and process 0 writes
a small manifest (scalars, shapes, dtypes). Restore is the dual: each
process reads just the chunks that overlap its target shards and builds
the sharded jax.Array via make_array_from_single_device_arrays — so a
checkpoint written on one mesh shape restores onto any other (the
cross-mesh-shape property of the round-1 global format, kept without the
memory cliff).

Format
  {prefix}_{timestep:06d}.manifest.npz   scalars + per-field shape/dtype
  {prefix}_{timestep:06d}.shards{pid:04d}.npz
      keys "<name>@<o0>_<o1>_..." -> chunk array at global offset (o0,..)
"""

from __future__ import annotations

import glob
import io as _io
import os
import re

import numpy as np


def _chunk_key(name, index):
    offs = [(s.start or 0) for s in index]
    return name + "@" + "_".join(str(o) for o in offs)


def _parse_key(key):
    name, offs = key.rsplit("@", 1)
    return name, tuple(int(o) for o in offs.split("_"))


def _field_items(state, stats=None, extra=None):
    """Flatten the checkpointable array leaves to (name, array) pairs
    (mirrors the global writer's key layout, io/checkpoint.py)."""
    items = []
    for k in ("u", "v", "w", "phi", "key"):
        if k in state:
            items.append((k, state[k]))
    for i, o in enumerate(state.get("olds", ())):
        for j, a in enumerate(o):
            items.append((f"olds_{i}_{j}", a))
    for i, c in enumerate(state.get("comp", ())):
        items.append((f"comp_{i}", c))
    for k, v in (stats or {}).items():
        items.append((f"stats_{k}", v))
    for k, v in (extra or {}).items():
        items.append((f"extra_{k}", v))
    return items


def _addressable_chunks(x):
    """[(index, np_chunk)] for this process, deduplicated by offset
    (replicated axes repeat the same chunk on several devices)."""
    import jax
    if not isinstance(x, jax.Array) or not hasattr(x, "addressable_shards"):
        arr = np.asarray(x)
        return [(tuple(slice(0, s) for s in arr.shape), arr)]
    seen = {}
    for sh in x.addressable_shards:
        idx = tuple(slice(s.start or 0, s.stop if s.stop is not None
                          else dim)
                    for s, dim in zip(sh.index, x.shape)) \
            if sh.index else tuple(slice(0, d) for d in x.shape)
        key = tuple((s.start, s.stop) for s in idx)
        if key not in seen:
            seen[key] = (idx, np.asarray(sh.data))
    return list(seen.values())


def write_sharded(prefix, timestep, state, time, dt, stats=None,
                  extra=None, async_write=True):
    """Write this process's shard file (+ manifest on process 0).
    Returns the manifest path."""
    import jax
    from . import native

    items = _field_items(state, stats, extra)
    pid = jax.process_index()

    chunks = {}
    meta = {}
    for name, arr in items:
        meta[f"shape::{name}"] = np.asarray(np.shape(arr))
        meta[f"dtype::{name}"] = np.asarray(str(np.asarray(
            jax.tree_util.tree_leaves(arr)[0]).dtype
            if not hasattr(arr, "dtype") else arr.dtype))
        for idx, data in _addressable_chunks(arr):
            if data.dtype.kind not in "fiub":
                # non-native dtypes (bf16 olds, X3D2_BF16_OLDS) degrade
                # to void in .npz — archive as f32 (exact upcast); the
                # dtype:: meta keeps the original and restore casts back
                data = data.astype(np.float32)
            chunks[_chunk_key(name, idx)] = data

    shard_path = f"{prefix}_{timestep:06d}.shards{pid:04d}.npz"
    buf = _io.BytesIO()
    np.savez(buf, **chunks)
    if async_write:
        native.async_write(shard_path, buf.getvalue())
    else:
        with open(shard_path, "wb") as fh:
            fh.write(buf.getvalue())

    manifest_path = f"{prefix}_{timestep:06d}.manifest.npz"
    if pid == 0:
        if "olds" in state:
            meta["n_olds_vars"] = np.asarray(len(state["olds"]))
            meta["n_olds"] = np.asarray(
                max((len(o) for o in state["olds"]), default=0))
        meta["timestep"] = np.asarray(timestep)
        meta["time"] = np.asarray(time)
        meta["dt"] = np.asarray(dt)
        meta["n_shard_files"] = np.asarray(jax.process_count())
        mbuf = _io.BytesIO()
        np.savez(mbuf, **meta)
        if async_write:
            native.async_write(manifest_path, mbuf.getvalue())
        else:
            with open(manifest_path, "wb") as fh:
                fh.write(mbuf.getvalue())
    return manifest_path


class _ChunkReader:
    """Lazy view over all shard files of one checkpoint."""

    def __init__(self, manifest_path):
        self.manifest = np.load(manifest_path)
        base = manifest_path[:-len(".manifest.npz")]
        self.files = [np.load(p) for p in
                      sorted(glob.glob(base + ".shards*.npz"))]
        if not self.files:
            raise FileNotFoundError(f"no shard files next to "
                                    f"{manifest_path}")
        # name -> [(offsets, file, key)]
        self.index = {}
        for f in self.files:
            for key in f.files:
                name, offs = _parse_key(key)
                self.index.setdefault(name, []).append((offs, f, key))

    def names(self):
        return set(self.index)

    def shape(self, name):
        return tuple(int(s) for s in self.manifest[f"shape::{name}"])

    def read_slice(self, name, index):
        """Assemble the sub-array state[name][index] from overlapping
        chunks (never touching non-overlapping ones)."""
        shape = self.shape(name)
        index = tuple(slice(s.start or 0,
                            s.stop if s.stop is not None else dim)
                      for s, dim in zip(index, shape))
        out_shape = tuple(s.stop - s.start for s in index)
        out = None
        filled = 0
        for offs, f, key in self.index[name]:
            # chunk extent from its stored shape
            cshape = f[key].shape
            ov = []
            for d, (s, o, c) in enumerate(zip(index, offs, cshape)):
                lo = max(s.start, o)
                hi = min(s.stop, o + c)
                if lo >= hi:
                    ov = None
                    break
                ov.append((lo, hi, o))
            if ov is None:
                continue
            data = f[key]
            src = tuple(slice(lo - o, hi - o) for lo, hi, o in ov)
            dst = tuple(slice(lo - s.start, hi - s.start)
                        for (lo, hi, _), s in zip(ov, index))
            if out is None:
                out = np.empty(out_shape, data.dtype)
            out[dst] = data[src]
            filled += int(np.prod([hi - lo for lo, hi, _ in ov]))
        if out is None or filled < int(np.prod(out_shape)):
            raise ValueError(f"checkpoint chunks do not cover "
                             f"{name}[{index}]")
        return out

    def read_global(self, name):
        shape = self.shape(name)
        return self.read_slice(name, tuple(slice(0, s) for s in shape))


def _place(reader, name, like, dtype=None):
    """Build the restored array for `name` with the sharding of `like`:
    each process reads only the chunks overlapping its addressable
    shards."""
    import jax
    import jax.numpy as jnp
    shape = reader.shape(name)
    dtype = dtype or like.dtype
    sharding = getattr(like, "sharding", None)
    if (not isinstance(like, jax.Array) or sharding is None
            or tuple(like.shape) != tuple(shape)):
        return jnp.asarray(reader.read_global(name), dtype)
    arrs = []
    for d, index in sharding.addressable_devices_indices_map(shape).items():
        index = tuple(slice(s.start or 0,
                            s.stop if s.stop is not None else dim)
                      for s, dim in zip(index, shape))
        chunk = reader.read_slice(name, index).astype(dtype)
        arrs.append(jax.device_put(chunk, d))
    return jax.make_array_from_single_device_arrays(
        shape, sharding, arrs)


def restore_sharded(manifest_path, state, dtype=None):
    """Load a per-shard checkpoint into a state template (arrays keep the
    template's shardings; chunk reads are shard-local).
    Returns (state, timestep, time, dt, stats)."""
    import jax.numpy as jnp
    reader = _ChunkReader(manifest_path)
    m = reader.manifest
    new = dict(state)
    dtype = dtype or state["u"].dtype
    for k in ("u", "v", "w", "phi"):
        if k in reader.names() and k in new:
            new[k] = _place(reader, k, state[k], dtype)
    if "key" in reader.names() and "key" in new:
        new["key"] = jnp.asarray(reader.read_global("key"),
                                 new["key"].dtype)
    if "olds" in state and "n_olds_vars" in m:
        n = int(m["n_olds_vars"])
        olds = []
        for i in range(n):
            js = sorted(int(nm.split("_")[2]) for nm in reader.names()
                        if nm.startswith(f"olds_{i}_"))
            tmpl = state["olds"][i]

            def _tp(j, tmpl=tmpl):
                return tmpl[j if j < len(tmpl) else -1]
            # history restores at the LIVE state's precision (bf16 when
            # X3D2_BF16_OLDS; the archive holds exact f32 upcasts)
            olds.append(tuple(
                _place(reader, f"olds_{i}_{j}", _tp(j), _tp(j).dtype)
                for j in js))
        new["olds"] = tuple(olds)
    if "comp" in state:
        new["comp"] = tuple(
            _place(reader, f"comp_{i}", state["comp"][i], dtype)
            if f"comp_{i}" in reader.names() else state["comp"][i] * 0
            for i in range(len(state["comp"])))
    stats = {nm[len("stats_"):]: reader.read_global(nm)
             for nm in reader.names() if nm.startswith("stats_")}
    timestep = int(m["timestep"])
    new["istep"] = jnp.asarray(timestep + 1, new["istep"].dtype)
    return new, timestep, float(m["time"]), float(m["dt"]), stats


def cleanup_sharded(prefix, keep_manifest):
    """Remove all checkpoint files except the ones belonging to
    `keep_manifest` (primary only; mirrors CheckpointManager._cleanup)."""
    keep_base = keep_manifest[:-len(".manifest.npz")]
    pat = re.compile(re.escape(prefix) + r"_\d+\.(manifest|shards\d+)\.npz$")
    for f in glob.glob(f"{prefix}_*.npz"):
        if pat.search(f) and not f.startswith(keep_base + "."):
            os.remove(f)
