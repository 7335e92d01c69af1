#!/usr/bin/env python
"""HBM-throughput ladder: can anything beat Mosaic's grid pipeliner?

Context (CLAUDE.md chip empirics): XLA elementwise streams ~420 GB/s
effective on the v5e; Pallas grid-pipelined kernels cap at ~260 GB/s
regardless of block shape. Every hot sweep kernel is DMA-bound at that
cap, so lifting it is worth more than any remaining flop trick. This
tool measures a pure read+write copy (the sweep traffic model) through
every mechanism we can express:

  xla          jnp scale copy (the 420 GB/s reference)
  grid[bs]     pallas_call, grid over plane blocks, default (arbitrary)
               pipeliner semantics -- the production kernels' shape
  par[bs]      same with dimension_semantics=("parallel",)
  hbm2hbm[C]   gridless kernel issuing chunked HBM->HBM DMAs, C in
               flight (no VMEM bounce): raw copy-engine concurrency
  bounce[S]    gridless kernel, manual HBM->VMEM->HBM pipeline with S
               scratch slots (in-DMA lookahead S-1, outs overlapped)

If hbm2hbm or bounce clears ~260, the cap is the pipeliner, not the
engine, and the sweep kernels can adopt manual DMA. If nothing clears
it, the cap is fundamental (single-core DMA issue rate) and the
remaining roadmap item dies with a measurement.

Usage: python tools/prof_dma.py [n] [iters]   (relay must be up)
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
interpret = os.environ.get("X3D2_INTERPRET", "0") == "1"

VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def loop_time(label, f, x, nbytes):
    try:
        return _loop_time(label, f, x, nbytes)
    except Exception as e:  # keep the ladder running past a bad rung
        print(f"{label:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None


def _loop_time(label, f, x, nbytes):
    def looped(x):
        out = jax.lax.fori_loop(0, iters, lambda i, c: f(c), x)
        return jnp.sum(out[0])

    g = jax.jit(looped)
    r = float(g(x))  # compile + warm
    times = []
    for k in (2, 3):
        a = x * (1.0 + 1e-6 * k)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        float(g(a))
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    print(f"{label:24s} {ms:8.2f} ms  {nbytes / ms * 1e-6:7.0f} GB/s"
          f"   (check {r:.3e})")
    return ms


# --- 1. XLA reference -------------------------------------------------------

def xla_copy(x):
    return x * 1.0000001


# --- 2. grid-pipelined pallas copy ------------------------------------------

def _scale_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.0000001


def grid_copy(x, bs, parallel):
    nb = x.shape[0] // bs
    cp = VMEM_LIMIT
    if parallel:
        cp = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT.vmem_limit_bytes,
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        _scale_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((bs,) + x.shape[1:], lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bs,) + x.shape[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=cp,
        interpret=interpret,
    )(x)


# --- 3. raw HBM->HBM chunk DMAs, C concurrent -------------------------------

def hbm2hbm(x, chunk_planes, conc):
    nchunks = x.shape[0] // chunk_planes

    def kernel(x_hbm, o_hbm):
        def body(sems):
            def dma(i, slot):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * chunk_planes, chunk_planes)],
                    o_hbm.at[pl.ds(i * chunk_planes, chunk_planes)],
                    sems.at[slot])

            def loop(i, _):
                slot = jax.lax.rem(i, conc)

                @pl.when(i >= conc)
                def _():
                    dma(i - conc, slot).wait()

                dma(i, slot).start()
                return 0

            jax.lax.fori_loop(0, nchunks, loop, 0)
            # drain
            def drain(i, _):
                first = nchunks - jnp.minimum(nchunks, conc)
                dma(first + i, jax.lax.rem(first + i, conc)).wait()
                return 0
            jax.lax.fori_loop(0, min(conc, nchunks), drain, 0)

        pl.run_scoped(body, sems=pltpu.SemaphoreType.DMA((conc,)))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(x)


# --- 3b. emit_pipeline: Pallas' software pipeliner inside one kernel ---------

def emit_pipe(x, chunk_planes):
    nchunks = x.shape[0] // chunk_planes
    cshape = (chunk_planes,) + x.shape[1:]

    def inner(x_ref, o_ref):
        # emit_pipeline passes only the refs (grid index via program_id)
        o_ref[:] = x_ref[:] * 1.0000001

    def kernel(x_hbm, o_hbm):
        pltpu.emit_pipeline(
            inner,
            grid=(nchunks,),
            in_specs=[pl.BlockSpec(cshape, lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec(cshape, lambda i: (i, 0, 0))],
        )(x_hbm, o_hbm)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(x)


# --- 4. manual HBM->VMEM->HBM pipeline, S slots ------------------------------

def bounce(x, chunk_planes, slots):
    nchunks = x.shape[0] // chunk_planes
    cshape = (chunk_planes,) + x.shape[1:]

    def kernel(x_hbm, o_hbm):
        def body(scratch, in_sems, out_sems):
            def in_dma(i, slot):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * chunk_planes, chunk_planes)],
                    scratch.at[slot], in_sems.at[slot])

            def out_dma(i, slot):
                return pltpu.make_async_copy(
                    scratch.at[slot],
                    o_hbm.at[pl.ds(i * chunk_planes, chunk_planes)],
                    out_sems.at[slot])

            # in-DMA lookahead: slots-2 keeps one slot of slack so the
            # out-DMA we must wait on (chunk i+look-slots) has had two
            # iterations to drain; slots=2 is the classic ping-pong
            look = max(1, slots - 2)
            for j in range(min(look, nchunks)):
                in_dma(j, j % slots).start()

            def loop(i, _):
                slot = jax.lax.rem(i, slots)
                # launch the lookahead in-DMA (slot freed by the out-DMA
                # of chunk i+look-slots, which must complete first)
                @pl.when(i + look < nchunks)
                def _():
                    nslot = jax.lax.rem(i + look, slots)

                    @pl.when(i + look >= slots)
                    def _():
                        out_dma(i + look - slots, nslot).wait()

                    in_dma(i + look, nslot).start()

                in_dma(i, slot).wait()
                # touch the data so Mosaic can't elide the bounce: the
                # production sweeps compute here
                scratch[slot] = scratch[slot] * 1.0000001
                out_dma(i, slot).start()
                return 0

            jax.lax.fori_loop(0, nchunks, loop, 0)
            def drain(j, _):
                first = nchunks - jnp.minimum(nchunks, slots)
                out_dma(first + j, jax.lax.rem(first + j, slots)).wait()
                return 0
            jax.lax.fori_loop(0, min(slots, nchunks), drain, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((slots,) + cshape, x.dtype),
            in_sems=pltpu.SemaphoreType.DMA((slots,)),
            out_sems=pltpu.SemaphoreType.DMA((slots,)))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=VMEM_LIMIT,
        interpret=interpret,
    )(x)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    nb = 2 * n**3 * 4  # read + write

    ref = float(jnp.sum(xla_copy(x)[0]))
    print(f"n={n} iters={iters}  expected check ~{ref:.3e} (pre-perturb)")
    loop_time("xla", xla_copy, x, nb)
    for bs in (1, 4, 8):
        if n % bs == 0:
            loop_time(f"grid[bs={bs}]",
                      functools.partial(grid_copy, bs=bs, parallel=False),
                      x, nb)
            loop_time(f"par[bs={bs}]",
                      functools.partial(grid_copy, bs=bs, parallel=True),
                      x, nb)
    # emit_pipeline resolves the device kind at trace time (no CPU/
    # interpret support; jax/_src/pallas/mosaic/tpu_info.py)
    if jax.devices()[0].platform == "tpu" and not interpret:
        for cp in (1, 4, 8):
            if n % cp == 0:
                loop_time(f"emit_pipe[cp={cp}]",
                          functools.partial(emit_pipe, chunk_planes=cp),
                          x, nb)
    for conc in (1, 2, 4, 8):
        loop_time(f"hbm2hbm[C={conc}]",
                  functools.partial(hbm2hbm, chunk_planes=4, conc=conc),
                  x, nb)
    for slots in (2, 3, 4, 6):
        loop_time(f"bounce[S={slots}]",
                  functools.partial(bounce, chunk_planes=4, slots=slots),
                  x, nb)
    for cp in (2, 8):
        if n % cp == 0:
            loop_time(f"bounce[S=4,cp={cp}]",
                      functools.partial(bounce, chunk_planes=cp, slots=4),
                      x, nb)


if __name__ == "__main__":
    main()
