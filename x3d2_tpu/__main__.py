"""CLI entry point: ``python -m x3d2_tpu <input.x3d>``.

Equivalent of the reference main program (src/xcompact.f90:48-133): parse
the namelist input, build mesh + solver + case via the flow_case factory,
run the time loop. The reference's MPI/GPU-device setup is replaced by
jax device-mesh selection (--mesh Y Z shards over devices)."""

from __future__ import annotations

import argparse

import numpy as np


def make_case(cfg, dtype, seed=0, verbose=True, monitor_path="monitoring.csv"):
    """Case factory (xcompact.f90:111-126)."""
    from .mesh import Mesh
    from .cases import ChannelCase, CylinderCase, GenericCase, TGVCase

    mesh = Mesh.from_config(cfg.domain)
    name = cfg.domain.flow_case_name.lower()
    table = {"tgv": (TGVCase, None),
             "channel": (ChannelCase, cfg.channel),
             "cylinder": (CylinderCase, cfg.cylinder),
             "generic": (GenericCase, None)}
    if name not in table:
        raise SystemExit(f"flow_case_name '{name}' is undefined")
    cls, case_cfg = table[name]
    return cls(mesh, cfg.solver, dtype=dtype, seed=seed, verbose=verbose,
               monitor_path=monitor_path, case_cfg=case_cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="x3d2_tpu")
    parser.add_argument("input", help="namelist input file (.x3d)")
    parser.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--mesh", type=int, nargs="+", metavar="N",
                        help="shard over a device mesh: NY NZ "
                             "(x kept whole, the fast path) or NX NY NZ "
                             "(x-decomposed operator path)")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host: coordinator host:port "
                             "(or set JAX_COORDINATOR_ADDRESS / "
                             "JAX_NUM_PROCESSES / JAX_PROCESS_ID)")
    parser.add_argument("--n-iters", type=int, default=None,
                        help="override the input file's n_iters "
                             "(smoke runs, partial restarts)")
    args = parser.parse_args(argv)

    # multi-host: must run before any jax backend use (the analogue of
    # the reference's MPI_Init, xcompact.f90:48-61); after this
    # jax.devices() is the GLOBAL device list across all hosts
    from .parallel.multihost import is_primary, maybe_init_distributed
    distributed = maybe_init_distributed(coordinator=args.coordinator)

    import jax
    import jax.numpy as jnp
    from .config import Config

    cfg = Config.from_file(args.input)
    if args.n_iters is not None:
        cfg.solver.n_iters = args.n_iters

    # Honour the input file's decomposition request (reference
    # mesh.f90:160-194 accepts any nproc_dir(3)). On TPU, x is the
    # lane/solve axis — the Pallas kernel fast paths want it whole —
    # but nproc_dir(1) > 1 is supported like the reference: the mesh
    # gains an 'x' axis and the step runs the halo-operator + GSPMD
    # spectral path (parallel/topo.make_device_mesh). A warning flags
    # the perf difference so a (1, NY, NZ) layout stays the default.
    npd = tuple(int(p) for p in cfg.domain.nproc_dir)
    if args.mesh is not None and len(args.mesh) not in (2, 3):
        raise SystemExit("--mesh takes NY NZ or NX NY NZ")
    if not args.mesh and npd[0] * npd[1] * npd[2] > 1:
        args.mesh = npd if npd[0] > 1 else (npd[1], npd[2])
    if args.mesh and len(args.mesh) == 3 and args.mesh[0] > 1 \
            and is_primary():
        print(f"note: x-decomposed mesh {tuple(args.mesh)} — the Pallas "
              "kernel fast paths need x whole; running the halo-operator "
              "path (prefer 1 x NY x NZ on TPU slices)")
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    case = make_case(cfg, dtype, seed=args.seed,
                     verbose=is_primary())
    # physical pressure only reconstructed when output requests it
    case.keep_pressure = (cfg.checkpoint.has_output_field("pressure")
                          or cfg.stats.initstat > 0)
    if is_primary():
        print(f"Flow case: {case.name}; grid {cfg.domain.dims_global}; "
              f"{cfg.solver.time_intg}, dt={cfg.solver.dt}, "
              f"Re={cfg.solver.Re}, {len(jax.devices())} device(s), "
              f"{jax.process_count()} process(es)")

    from .io.manager import IOManager
    io_mgr = IOManager(case, cfg.checkpoint, cfg.stats)

    if distributed and not args.mesh:
        # multi-host default: factor the global device count into (y, z)
        # like the reference's nproc_dir fallback (xcompact.f90:69-74)
        nd = jax.device_count()
        ny = int(np.sqrt(nd))
        while nd % ny:
            ny -= 1
        args.mesh = (ny, nd // ny)

    if args.mesh:
        from .parallel import make_device_mesh, make_sharded_step, shard_state
        if len(args.mesh) == 3:
            dmesh = make_device_mesh(args.mesh[1], args.mesh[2],
                                     nproc_x=args.mesh[0])
        else:
            dmesh = make_device_mesh(args.mesh[0], args.mesh[1])
        step, state = make_sharded_step(case, dmesh)
        case._step = step
        fresh = not io_mgr.checkpoint_cfg.restart_from_checkpoint
        restored = io_mgr.handle_restart(state)
        if restored is not state:
            # restart loads host arrays; re-place them on the device mesh
            restored = shard_state(dmesh, restored)
        case.run(state=restored, io_manager=io_mgr, fresh=fresh)
    else:
        fresh = not io_mgr.checkpoint_cfg.restart_from_checkpoint
        state = io_mgr.handle_restart(case.initial_state())
        case.run(state=state, io_manager=io_mgr, fresh=fresh)


if __name__ == "__main__":
    main()
