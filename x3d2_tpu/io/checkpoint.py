"""Checkpoint/restart manager.

Functional parity with reference src/io/checkpoint_manager.f90:
  - contents: u, v, w (+species), timestep/time/dt/data_loc, the AB
    derivative history, running statistics, and case-registered extra
    state (checkpoint_manager.f90:150-330)
  - atomic write via temp file + rename (:296-310)
  - old-checkpoint cleanup when keep_checkpoint is false
  - restart restores fields, AB history, stats, and resumes at
    current_iter+1 (:346-501; bit-exactness tested like
    tests/unit/test_ab_checkpoint.f90)

Storage: a single .npz per checkpoint holding logically-global unpadded
arrays (the reference stores backend-padded per-rank blocks; global
layout is sharding-agnostic and restores onto any device mesh). The RNG
key is also saved so stochastic BCs resume deterministically.
"""

from __future__ import annotations

import glob
import os

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, config, verbose=True):
        self.config = config
        self.verbose = verbose

    def _fname(self, timestep):
        return f"{self.config.checkpoint_prefix}_{timestep:06d}.npz"

    def should_checkpoint(self, timestep) -> bool:
        f = self.config.checkpoint_freq
        return f > 0 and timestep % f == 0

    def _sharded_io(self) -> bool:
        """Per-shard files (io/sharded.py) when configured, defaulting to
        on for multi-process runs: gathering global fields onto host 0
        stops fitting one grid-doubling after it starts hurting (the
        reference writes per-rank blocks for the same reason,
        checkpoint_manager.f90:223-283)."""
        cfg = getattr(self.config, "sharded_io", None)
        if cfg is not None:
            return bool(cfg)
        import jax
        return jax.process_count() > 1

    def write(self, state, timestep, time, dt, stats=None, extra=None):
        if self._sharded_io():
            from .sharded import cleanup_sharded, write_sharded
            from ..parallel.multihost import is_primary
            from . import native
            path = write_sharded(self.config.checkpoint_prefix, timestep,
                                 state, time, dt, stats, extra)
            if self.verbose and is_primary():
                print(f"Checkpoint written (sharded): {path}")
            if not self.config.keep_checkpoint and is_primary():
                native.async_flush()
                cleanup_sharded(self.config.checkpoint_prefix, path)
            return path
        # gather_global is collective (all processes participate) and a
        # plain np.asarray single-process; only process 0 touches the FS
        from ..parallel.multihost import gather_global, is_primary
        arrays = {}
        for k in ("u", "v", "w", "phi", "key"):
            if k in state:
                arrays[k] = gather_global(state[k])
        if "olds" in state:
            # olds[i] is a (nolds,)-tuple of arrays; stored stacked so the
            # on-disk format matches round 1 (and the reference's "olds"
            # blocks, checkpoint_manager.f90:223-283)
            for i, o in enumerate(state["olds"]):
                arr = (np.stack([gather_global(a) for a in o])
                       if len(o) else np.zeros((0,)))
                if arr.dtype not in (np.float32, np.float64):
                    # reduced-precision history (X3D2_BF16_OLDS) is
                    # archived as f32 — the upcast is exact and .npz has
                    # no bf16 descr; restore() casts back bit-exactly
                    arr = arr.astype(np.float32)
                arrays[f"olds_{i}"] = arr
            arrays["n_olds_vars"] = np.asarray(len(state["olds"]))
        if "comp" in state:
            for i, c in enumerate(state["comp"]):
                arrays[f"comp_{i}"] = gather_global(c)
        arrays["timestep"] = np.asarray(timestep)
        arrays["time"] = np.asarray(time)
        arrays["dt"] = np.asarray(dt)
        if stats is not None:
            for k, v in stats.items():
                arrays[f"stats_{k}"] = gather_global(v)
        if extra is not None:
            for k, v in extra.items():
                arrays[f"extra_{k}"] = gather_global(v)

        fname = self._fname(timestep)
        if not is_primary():
            return fname
        # serialise on the main thread; file write + atomic rename happen
        # on the native background writer (checkpoint_manager.f90:296-310
        # temp+mv semantics without blocking the time loop)
        import io as _io
        from . import native
        buf = _io.BytesIO()
        np.savez(buf, **arrays)
        native.async_write(fname, buf.getvalue())
        if self.verbose:
            print(f"Checkpoint written: {fname}")
        if not self.config.keep_checkpoint:
            native.async_flush()
            self._cleanup(keep=fname)
        return fname

    def _cleanup(self, keep):
        for f in glob.glob(f"{self.config.checkpoint_prefix}_*.npz"):
            if f != keep:
                os.remove(f)

    def latest(self):
        from . import native
        native.async_flush()  # ensure queued checkpoints are durable
        files = sorted(f for f in
                       glob.glob(f"{self.config.checkpoint_prefix}_*.npz")
                       if ".shards" not in f)
        return files[-1] if files else None

    def restore(self, state, path=None, dtype=None):
        """Load a checkpoint into an existing state pytree template.
        Returns (state, timestep, time, dt, stats). Dispatches on the
        on-disk format: per-shard manifests restore shard-locally
        (io/sharded.py), single-file checkpoints load globally."""
        from . import native
        native.async_flush()
        path = path or self.config.restart_file or self.latest()
        if not path or not os.path.exists(path):
            raise FileNotFoundError(f"no checkpoint found at {path!r}")
        if path.endswith(".manifest.npz"):
            from .sharded import restore_sharded
            out = restore_sharded(path, state, dtype=dtype)
            if self.verbose:
                print(f"Restart from {path} at iteration {out[1]}")
            return out
        import jax.numpy as jnp
        z = np.load(path)
        new = dict(state)
        dtype = dtype or state["u"].dtype
        for k in ("u", "v", "w", "phi"):
            if k in z and k in new:
                new[k] = jnp.asarray(z[k], dtype)
        if "key" in z and "key" in new:
            new["key"] = jnp.asarray(z["key"], new["key"].dtype)
        if "olds" in state and "n_olds_vars" in z:
            n = int(z["n_olds_vars"])

            def _odt(i):
                # match the live state's history precision (bf16 when
                # X3D2_BF16_OLDS — archived f32, cast back is exact)
                o = state["olds"][i] if i < len(state["olds"]) else ()
                return o[0].dtype if len(o) else dtype
            new["olds"] = tuple(
                tuple(jnp.asarray(z[f"olds_{i}"][j], _odt(i))
                      for j in range(z[f"olds_{i}"].shape[0]))
                for i in range(n))
        if "comp" in state:
            new["comp"] = tuple(
                jnp.asarray(z[f"comp_{i}"], dtype)
                if f"comp_{i}" in z else jnp.zeros_like(state["comp"][i])
                for i in range(len(state["comp"])))
        timestep = int(z["timestep"])
        new["istep"] = jnp.asarray(timestep + 1, new["istep"].dtype)
        stats = {k[len("stats_"):]: z[k] for k in z.files
                 if k.startswith("stats_")}
        if self.verbose:
            print(f"Restart from {path} at iteration {timestep}")
        return new, timestep, float(z["time"]), float(z["dt"]), stats
