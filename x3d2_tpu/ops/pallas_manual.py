"""Manual-DMA x-stage applies: deeper buffering than Mosaic's pipeliner.

EXPERIMENTAL (round 3, relay-outage development). The grid-pipelined
kernels in pallas_poisson.py are DMA-bound at Mosaic's measured
~260 GB/s pipeline throughput while XLA streams ~420 GB/s on the same
chip (CLAUDE.md chip empirics) — the x-stage applies move 2 n^3 words
at ~1 ms of MXU work, so nearly half their wall-clock is potentially
recoverable. The hypothesis under test: Mosaic's implicit grid pipeline
is depth-2 (double buffering) and the cap is pipeline-depth, not DMA
granularity — grid kernels with fully-contiguous blocks hit the same
cap, so granularity is exonerated.

This module rebuilds make_x_apply (ops/pallas_poisson.py) as a single
gridless kernel that drives its own HBM<->VMEM pipeline with S scratch
slots via pltpu.make_async_copy: in-DMA lookahead of S-2 tiles, out-DMAs
overlapped, semaphore-rotated (same schedule as tools/prof_dma.py
`bounce`, where it is measured in isolation). Numerics are identical to
the grid kernels (same bf16 hi/lo split dots, same parity-split
transforms); only the data movement differs.

Wire-up is gated behind X3D2_MANUAL_XAPPLY=1 pending on-chip timing
(tools/prof_manual.py) — interpret-mode equivalence and deviceless-v5e
AOT Mosaic lowering are covered by tests/test_manual_xapply.py.

Reference analogue: the CUDA backend's hand-scheduled kernel launches
(/root/reference/src/backend/cuda/exec_dist.f90) — explicit overlap of
transfers and compute where the runtime's default scheduling leaves
bandwidth unused.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_transeq import VMEM_LIMIT
from .pallas_kernels import split_hi_lo
from .pallas_poisson import _mm_left, parity_split_folded

# scratch budget for the slot pipeline (VMEM_LIMIT is 64 MB; leave room
# for the resident matrices and Mosaic's own allocations)
_SCRATCH_BUDGET = 48 * 1024 * 1024


def _pick_t2(n_in, n_out, ny, nz, sub, slots, t1=8):
    """Largest 128-multiple t2 (preferring full nz — fully contiguous
    DMA segments of t1*nz*4 bytes) whose S slots fit the budget."""
    per_x = (n_in + n_out * (2 if sub else 1)) * 4  # bytes per (1,1)
    t2 = nz
    while t2 >= 128:
        if ny % t1 == 0 and nz % t2 == 0 \
                and per_x * t1 * t2 * slots <= _SCRATCH_BUDGET:
            return t2
        t2 //= 2
    raise ValueError(f"no t2 tiling fits the scratch budget for "
                     f"({n_in},{n_out},{ny},{nz},sub={sub},slots={slots})")


def make_x_apply_manual(M64, terms=2, sub=False, parity=None, slots=4,
                        t1=8, t2=None, interpret=False):
    """fn(f[, s]) = M @_axis0 f  [or s - M @ f when sub], numerically
    matching ops/pallas_poisson.make_x_apply, but as ONE gridless Pallas
    kernel with an S-slot manual DMA pipeline. parity='fwd'|'inv' runs
    the half-flop parity-split form (block-parity mode order)."""
    n_out, n_in = M64.shape
    if parity is not None and (n_in % 2 or n_out % 2):
        raise ValueError("parity x-apply needs even extents")
    if parity == "fwd" and sub:
        raise ValueError("sub is an inverse-stage fusion")
    if parity is None:
        mat_arrs = [jnp.asarray(p) for p in split_hi_lo(M64, terms)]
    else:
        Me, Mo = parity_split_folded(np.asarray(M64, np.float64),
                                     0 if parity == "fwd" else 1)
        mat_arrs = ([jnp.asarray(p) for p in split_hi_lo(Me, terms)]
                    + [jnp.asarray(p) for p in split_hi_lo(Mo, terms)])
    nparts = max(terms, 1)
    nmats = len(mat_arrs)

    def compute(mrefs, f, s):
        """(n_in, t1, t2) f32 -> (n_out, t1, t2) f32; mirrors the three
        grid-kernel bodies in pallas_poisson.py."""
        tshape = (n_out,) + f.shape[1:]
        if parity is None:
            r = _mm_left(mrefs, f.reshape(n_in, -1), terms)
        elif parity == "fwd":
            h = n_in // 2
            fa, fb = f[:h], f[h:]
            E = _mm_left(mrefs[:nparts], (fa + fb).reshape(h, -1), terms)
            O = _mm_left(mrefs[nparts:], (fa - fb).reshape(h, -1), terms)
            r = jnp.concatenate([E, O], axis=0)
        else:
            h_in = n_in // 2
            ze, zo = f[:h_in], f[h_in:]
            A = _mm_left(mrefs[:nparts], ze.reshape(h_in, -1), terms)
            B = _mm_left(mrefs[nparts:], zo.reshape(h_in, -1), terms)
            r = jnp.concatenate([A + B, A - B], axis=0)
        r = r.reshape(tshape)
        return s - r if sub else r

    def fn(f, s=None):
        ny, nz = f.shape[1], f.shape[2]
        t2v = _pick_t2(n_in, n_out, ny, nz, sub, slots, t1) \
            if t2 is None else t2
        if ny % t1 or nz % t2v:
            raise ValueError(f"manual x-apply tiling ({t1},{t2v}) "
                             f"cannot cover ({ny},{nz})")
        n1, n2 = ny // t1, nz // t2v
        ntiles = n1 * n2

        def kernel(*refs):
            f_hbm = refs[0]
            i0 = 2 if sub else 1
            s_hbm = refs[1] if sub else None
            mrefs = refs[i0:i0 + nmats]
            out_hbm = refs[i0 + nmats]

            def body(in_scr, s_scr, out_scr, in_sems, s_sems, out_sems):
                def hbm_slice(ref, i):
                    a = i // n2
                    b = jax.lax.rem(i, n2)
                    return ref.at[:, pl.ds(a * t1, t1),
                                  pl.ds(b * t2v, t2v)]

                def in_dma(i, slot):
                    return pltpu.make_async_copy(
                        hbm_slice(f_hbm, i), in_scr.at[slot],
                        in_sems.at[slot])

                def s_dma(i, slot):
                    return pltpu.make_async_copy(
                        hbm_slice(s_hbm, i), s_scr.at[slot],
                        s_sems.at[slot])

                def out_dma(i, slot):
                    return pltpu.make_async_copy(
                        out_scr.at[slot], hbm_slice(out_hbm, i),
                        out_sems.at[slot])

                def starts(i, slot):
                    in_dma(i, slot).start()
                    if sub:
                        s_dma(i, slot).start()

                # lookahead slots-2: the out-DMA we must wait on before
                # reusing a slot has had two iterations to drain
                # (schedule measured in tools/prof_dma.py `bounce`)
                look = max(1, slots - 2)
                for j in range(min(look, ntiles)):
                    starts(j, j)

                def loop(i, _):
                    slot = jax.lax.rem(i, slots)

                    @pl.when(i + look < ntiles)
                    def _():
                        nslot = jax.lax.rem(i + look, slots)

                        @pl.when(i + look >= slots)
                        def _():
                            out_dma(i + look - slots, nslot).wait()

                        starts(i + look, nslot)

                    in_dma(i, slot).wait()
                    sv = None
                    if sub:
                        s_dma(i, slot).wait()
                        sv = s_scr[slot]
                    out_scr[slot] = compute(mrefs, in_scr[slot], sv)
                    out_dma(i, slot).start()
                    return 0

                jax.lax.fori_loop(0, ntiles, loop, 0)

                def drain(j, _):
                    first = ntiles - jnp.minimum(ntiles, slots)
                    out_dma(first + j,
                            jax.lax.rem(first + j, slots)).wait()
                    return 0
                jax.lax.fori_loop(0, min(slots, ntiles), drain, 0)

            scr = functools.partial(pltpu.VMEM, dtype=jnp.float32)
            pl.run_scoped(
                body,
                in_scr=scr((slots, n_in, t1, t2v)),
                s_scr=(scr((slots, n_out, t1, t2v)) if sub
                       else pltpu.VMEM((1, 8, 128), jnp.float32)),
                out_scr=scr((slots, n_out, t1, t2v)),
                in_sems=pltpu.SemaphoreType.DMA((slots,)),
                s_sems=pltpu.SemaphoreType.DMA((slots,)),
                out_sems=pltpu.SemaphoreType.DMA((slots,)))

        args = (f, s) if sub else (f,)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        aspec = pl.BlockSpec(memory_space=pl.ANY)
        return pl.pallas_call(
            kernel,
            in_specs=[aspec] * (2 if sub else 1) + [vspec] * nmats,
            out_specs=aspec,
            out_shape=jax.ShapeDtypeStruct((n_out, ny, nz), f.dtype),
            compiler_params=VMEM_LIMIT,
            interpret=interpret,
        )(*args, *mat_arrs)

    return fn
