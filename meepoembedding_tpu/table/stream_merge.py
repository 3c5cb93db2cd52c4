"""Pallas stream-merge scatter-add (SURVEY.md C4, L0): the guaranteed
in-place values-plane update kernel for tables too big to double-buffer.

XLA:TPU scatter aliases a DONATED plane in-place (re-verified r4 at 8.6 GB
— see the threshold note at the bottom), so it is the default update path;
this kernel is the fallback for planes where a transient copy would OOM
(and insurance against donation-aliasing regressions). It streams only the
TOUCHED blocks of the plane through VMEM with double-buffered sequential
DMAs and merges the (vrow-sorted) updates into each block as ONE one-hot
matmul on the MXU:

    slab[q] += onehot(uvrow_window - block_base - 128q)^T @ upd_window

In-place via input_output_aliases: untouched blocks are never read or
written. Duplicate vrows are legal (the one-hot matmul sums them); windows
that overrun a dense block simply repeat the block id with an advanced
window start, and consecutive repeats reuse the live slab (no RAW hazard).

Traffic: 2 passes over touched blocks + 1 window pass over updates,
~bandwidth-bound, independent of total table size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meepoembedding_tpu.config import LANES

import os as _os

BLOCKR = int(_os.environ.get("MEEPO_STREAM_BLOCKR", 2048))  # rows per block
MAXU = int(_os.environ.get("MEEPO_STREAM_MAXU", 64))  # update rows/window
# (2048, 64) measured 22.3 ms vs (512, 32)'s 28.4 at 190K updates / 4.3GB on
# v5e: fewer grid steps (fewer per-step DMA latencies) win until the one-hot
# matmul flops catch up (4096/64 and 1024/32 regress)
ALIGN = 8  # window DMA starts must sit on the HBM sublane tiling (bf16
# planes pack 2 rows/sublane and Mosaic requires provable 8-divisibility),
# so windows advance by MAXU-ALIGN updates, are READ from the aligned-down
# start, and the kernel masks each window to its exact [off, off+stride) rows
STRIDE = MAXU - ALIGN
# uvrow sentinel: matches no block. MUST be a numpy scalar, NOT jnp: a
# module-level jax Array is a committed device constant, and depending on
# import/trace order jax hoists it as a LEADING program parameter — in front
# of the donated/aliased table planes — which broke the runtime's buffer
# donation for the whole composed train step (flaky InvalidArgument at every
# big-table config; r1's "67M-row ghost"). A numpy scalar always inlines as
# a literal.
_SENT = np.int32(2**30)


DEPTH = 3  # buffer-ring depth: reads for i+1 overlap compute(i) AND the
# in-flight write of i-1 (distinct ring slots -> no wait before issuing)


def _kernel(bids_ref, starts_ref, vwin_hbm, uwin_hbm, plane_ref,
            out_ref, slab, vbuf, ubuf, rsem, wsem):
    """Grid step i processes (block bids[i], updates [starts[i], +MAXU)).

    DEPTH-deep software pipeline over a buffer ring (slot r = i % DEPTH):
      - step 0 issues its own reads; every step issues step i+1's reads
        FIRST (into ring slot r+1, whose previous write drained at i-1)
      - drain the write of step i-(DEPTH-1) so its ring slot is reusable
      - wait this step's reads, merge via one-hot dot_general on the MXU
      - write the slab UNLESS bids[i+1] == bids[i] (dense-block windows
        repeat the block id; the repeat step copies the live slab over and
        continues accumulating — no intermediate HBM round trip)
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    r = i % DEPTH

    def bid_at(j):
        # bids are ENCODED bid * ALIGN + off (3 prefetch arrays would blow
        # the 1 MiB SMEM budget at 100M-row planes); negatives pass through
        raw = jnp.where((j >= 0) & (j < n), bids_ref[jnp.clip(j, 0, n - 1)], -2)
        return jnp.where(raw >= 0, raw // ALIGN, raw)

    def wrote_at(j):  # did step j issue a slab write?
        return (bid_at(j) >= 0) & (bid_at(j) != bid_at(j + 1))

    # NOTE: ring-slot indices into scratch refs must be PYTHON ints — a
    # traced leading index on a VMEM scratch ref silently corrupts (and
    # aborts real TPUs), so every slot-dependent op is unrolled over DEPTH
    # behind pl.when guards.
    def for_slot(slot, fn):
        for s in range(DEPTH):
            @pl.when(slot == s)
            def _(s=s):
                fn(s)

    def slab_read_dma(s: int, b):
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(b * BLOCKR, BLOCKR), :], slab.at[s],
            rsem.at[s, 0],
        )

    def slab_write_dma(s: int, b):
        return pltpu.make_async_copy(
            slab.at[s], out_ref.at[pl.ds(b * BLOCKR, BLOCKR), :],
            wsem.at[s],
        )

    def win_dmas(s: int, st):
        return (
            pltpu.make_async_copy(
                vwin_hbm.at[pl.ds(st, MAXU), :], vbuf.at[s], rsem.at[s, 1]
            ),
            pltpu.make_async_copy(
                uwin_hbm.at[pl.ds(st, MAXU), :], ubuf.at[s], rsem.at[s, 2]
            ),
        )

    def issue_reads(j):
        """Start reads for step j into ring slot j % DEPTH."""
        bj = bid_at(j)
        repeat_j = bj == bid_at(j - 1)
        # ALIGN-multiplied in-kernel so Mosaic can PROVE the DMA start is
        # tile-aligned (a prefetched runtime scalar alone is unprovable)
        st = starts_ref[jnp.clip(j, 0, n - 1)] * ALIGN

        def start(s):
            v, u = win_dmas(s, st)
            v.start()
            u.start()

            @pl.when(~repeat_j)
            def _():
                slab_read_dma(s, bj).start()

        @pl.when(bj >= 0)
        def _():
            for_slot(j % DEPTH, start)

    @pl.when(i == 0)
    def _():
        issue_reads(0)

    # make ring slot (i+1) % DEPTH safe: its last write was at step i+1-DEPTH
    @pl.when(wrote_at(i + 1 - DEPTH))
    def _():
        for_slot(
            (i + 1) % DEPTH,
            lambda s: slab_write_dma(s, bid_at(i + 1 - DEPTH)).wait(),
        )

    @pl.when(i + 1 < n)
    def _():
        issue_reads(i + 1)

    raw_i = bids_ref[i]
    bid = jnp.where(raw_i >= 0, raw_i // ALIGN, raw_i)
    live = bid >= 0
    is_repeat = bid == bid_at(i - 1)
    will_repeat = bid == bid_at(i + 1)

    def compute(s: int):
        v, u = win_dmas(s, starts_ref[i] * ALIGN)
        v.wait()
        u.wait()

        @pl.when(~is_repeat)
        def _():
            slab_read_dma(s, bid).wait()

        @pl.when(is_repeat)
        def _():
            # live slab sits in the previous ring slot; carry it over
            slab[s] = slab[(s - 1) % DEPTH]

        # one-hot matmul merge on the MXU (measured faster than per-update
        # dynamic-row VMEM RMWs: 47 vs 64 ms at 512K updates / 4.3 GB)
        uvrow = vbuf[s, :, 0]  # [MAXU] i32 (broadcast-encoded)
        # f32 for the MXU dot regardless of plane dtype (bf16 planes: a
        # mixed-precision dot_general is rejected by Mosaic)
        upd = ubuf[s].astype(jnp.float32)  # [MAXU, 128]
        base = bid * BLOCKR
        # this window owns EXACTLY buffer rows [off, off+STRIDE): the buffer
        # was read from the aligned-down start, and neighbors own the rest
        off = raw_i % ALIGN
        rowid = jax.lax.broadcasted_iota(jnp.int32, (MAXU, LANES), 0)
        own = (rowid >= off) & (rowid < off + STRIDE)
        for q in range(BLOCKR // LANES):
            # oh_T [MAXU, 128]: update j hits chunk-row l iff uvrow == row l
            rows = jax.lax.broadcasted_iota(jnp.int32, (MAXU, LANES), 1)
            oh = (
                (uvrow[:, None] - (base + q * LANES) == rows) & own
            ).astype(jnp.float32)
            delta = jax.lax.dot_general(
                oh, upd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [128 rows, 128 lanes]
            slab[s, q * LANES : (q + 1) * LANES, :] = (
                slab[s, q * LANES : (q + 1) * LANES, :] + delta.astype(slab.dtype)
            )

        @pl.when(~will_repeat)
        def _():
            slab_write_dma(s, bid).start()

    @pl.when(live)
    def _():
        for_slot(r, compute)

    # Tail: drain writes of the final DEPTH-1 steps. Step n-DEPTH's write was
    # already drained by THIS step's regular drain above — waiting a DMA
    # semaphore twice deadlocks the chip.
    @pl.when(i == n - 1)
    def _():
        for j_off in range(DEPTH - 2, -1, -1):
            j = i - j_off

            @pl.when(wrote_at(j))
            def _(j=j):
                for_slot(j % DEPTH, lambda s: slab_write_dma(s, bid_at(j)).wait())


def _kernel_set(bids_ref, starts_ref, vwin_hbm, uwin_hbm, mwin_hbm,
                plane_ref, out_ref, slab, vbuf, ubuf, mbuf, rsem, wsem):
    """SET variant of _kernel: slab lanes where the (one-hot-summed) window
    mask is set are REPLACED by the window values; others keep the slab.
    Same DEPTH-deep pipeline; one extra mask window buffer rides the reads.
    Lane-disjointness within a storage row is the caller's contract (unique
    slots own disjoint windows), so the one-hot dot unions masks exactly."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    r = i % DEPTH

    def bid_at(j):
        # bids are ENCODED bid * ALIGN + off (3 prefetch arrays would blow
        # the 1 MiB SMEM budget at 100M-row planes); negatives pass through
        raw = jnp.where((j >= 0) & (j < n), bids_ref[jnp.clip(j, 0, n - 1)], -2)
        return jnp.where(raw >= 0, raw // ALIGN, raw)

    def wrote_at(j):
        return (bid_at(j) >= 0) & (bid_at(j) != bid_at(j + 1))

    def for_slot(slot, fn):
        for s in range(DEPTH):
            @pl.when(slot == s)
            def _(s=s):
                fn(s)

    def slab_read_dma(s: int, b):
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(b * BLOCKR, BLOCKR), :], slab.at[s], rsem.at[s, 0]
        )

    def slab_write_dma(s: int, b):
        return pltpu.make_async_copy(
            slab.at[s], out_ref.at[pl.ds(b * BLOCKR, BLOCKR), :], wsem.at[s]
        )

    def win_dmas(s: int, st):
        return (
            pltpu.make_async_copy(
                vwin_hbm.at[pl.ds(st, MAXU), :], vbuf.at[s], rsem.at[s, 1]
            ),
            pltpu.make_async_copy(
                uwin_hbm.at[pl.ds(st, MAXU), :], ubuf.at[s], rsem.at[s, 2]
            ),
            pltpu.make_async_copy(
                mwin_hbm.at[pl.ds(st, MAXU), :], mbuf.at[s], rsem.at[s, 3]
            ),
        )

    def issue_reads(j):
        bj = bid_at(j)
        repeat_j = bj == bid_at(j - 1)
        # ALIGN-multiplied in-kernel so Mosaic can PROVE the DMA start is
        # tile-aligned (a prefetched runtime scalar alone is unprovable)
        st = starts_ref[jnp.clip(j, 0, n - 1)] * ALIGN

        def start(s):
            for d in win_dmas(s, st):
                d.start()

            @pl.when(~repeat_j)
            def _():
                slab_read_dma(s, bj).start()

        @pl.when(bj >= 0)
        def _():
            for_slot(j % DEPTH, start)

    @pl.when(i == 0)
    def _():
        issue_reads(0)

    @pl.when(wrote_at(i + 1 - DEPTH))
    def _():
        for_slot(
            (i + 1) % DEPTH,
            lambda s: slab_write_dma(s, bid_at(i + 1 - DEPTH)).wait(),
        )

    @pl.when(i + 1 < n)
    def _():
        issue_reads(i + 1)

    raw_i = bids_ref[i]
    bid = jnp.where(raw_i >= 0, raw_i // ALIGN, raw_i)
    live = bid >= 0
    is_repeat = bid == bid_at(i - 1)
    will_repeat = bid == bid_at(i + 1)

    def compute(s: int):
        for d in win_dmas(s, starts_ref[i] * ALIGN):
            d.wait()

        @pl.when(~is_repeat)
        def _():
            slab_read_dma(s, bid).wait()

        @pl.when(is_repeat)
        def _():
            slab[s] = slab[(s - 1) % DEPTH]

        uvrow = vbuf[s, :, 0]
        upd = ubuf[s].astype(jnp.float32)
        msk = mbuf[s].astype(jnp.float32)
        base = bid * BLOCKR
        off = raw_i % ALIGN
        rowid = jax.lax.broadcasted_iota(jnp.int32, (MAXU, LANES), 0)
        own = (rowid >= off) & (rowid < off + STRIDE)
        for q in range(BLOCKR // LANES):
            rows = jax.lax.broadcasted_iota(jnp.int32, (MAXU, LANES), 1)
            oh = (
                (uvrow[:, None] - (base + q * LANES) == rows) & own
            ).astype(jnp.float32)
            newv = jax.lax.dot_general(
                oh, upd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            newm = jax.lax.dot_general(
                oh, msk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            cur = slab[s, q * LANES : (q + 1) * LANES, :]
            slab[s, q * LANES : (q + 1) * LANES, :] = jnp.where(
                newm > 0.5, newv.astype(slab.dtype), cur
            )

        @pl.when(~will_repeat)
        def _():
            slab_write_dma(s, bid).start()

    @pl.when(live)
    def _():
        for_slot(r, compute)

    @pl.when(i == n - 1)
    def _():
        for j_off in range(DEPTH - 2, -1, -1):
            j = i - j_off

            @pl.when(wrote_at(j))
            def _(j=j):
                for_slot(j % DEPTH, lambda s: slab_write_dma(s, bid_at(j)).wait())


def _plan_windows(uvrow_sorted, m_pad: int, nblocks: int, max_steps: int):
    """XLA-side planning: touched blocks -> (bids [G], starts [G], offs [G])
    with dense blocks repeated every STRIDE updates. G = max_steps (static),
    padded with bid = -1. `starts` are ALIGN-aligned DMA starts; `offs` is
    the true window start within the read buffer — the kernel applies only
    buffer rows [off, off+STRIDE), so neighbors never double-apply."""
    blk = uvrow_sorted // BLOCKR  # [m_pad], sentinel rows -> huge
    m = uvrow_sorted.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), bool), blk[1:] != blk[:-1]])
    # windows: a new grid step starts at every block boundary AND every
    # STRIDE updates within a block
    first_of_blk = jnp.where(is_first, idx, 0)
    first_of_blk = jax.lax.cummax(first_of_blk)
    is_step = is_first | (((idx - first_of_blk) % STRIDE) == 0)
    is_step &= blk < nblocks  # drop sentinel tail
    rank = jnp.cumsum(is_step) - 1
    pos = jnp.where(is_step & (rank < max_steps), rank.astype(jnp.int32), max_steps)
    bids = jnp.full((max_steps,), -1, jnp.int32).at[pos].set(
        blk.astype(jnp.int32), mode="drop", unique_indices=True
    )
    starts = jnp.zeros((max_steps,), jnp.int32).at[pos].set(
        idx, mode="drop", unique_indices=True
    )
    # clamp so reads stay in bounds (padded tail guarantees room), then
    # align down for the DMA and carry the remainder as the in-buffer offset
    starts = jnp.minimum(starts, m_pad - MAXU)
    offs = starts % ALIGN
    bids_enc = jnp.where(bids >= 0, bids * ALIGN + offs, bids)
    return bids_enc, (starts - offs) // ALIGN


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def _stream_merge_add(plane, vrow, upd, interpret):
    R = plane.shape[0]
    assert R % BLOCKR == 0, f"plane rows {R} must be a multiple of {BLOCKR}"
    nblocks = R // BLOCKR
    m = vrow.shape[0]
    # sort updates by vrow (sentinel rows last); rows follow via one gather
    key = jnp.where((vrow >= 0) & (vrow < R), vrow, _SENT)
    skey, order = jax.lax.sort((key, jnp.arange(m, dtype=jnp.int32)), num_keys=1)
    supd = jnp.take(upd.astype(plane.dtype), order, axis=0)
    # pad so every window read stays in bounds
    m_pad = m + MAXU
    skey = jnp.concatenate([skey, jnp.full((MAXU,), _SENT, jnp.int32)])
    supd = jnp.concatenate([supd, jnp.zeros((MAXU, LANES), supd.dtype)])
    vbro = jnp.broadcast_to(skey[:, None], (m_pad, LANES))  # lane-broadcast i32

    max_steps = min(nblocks, m) + -(-m // STRIDE)
    bids, starts = _plan_windows(skey, m_pad, nblocks, max_steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # vbro
            pl.BlockSpec(memory_space=pltpu.ANY),  # supd
            pl.BlockSpec(memory_space=pltpu.ANY),  # plane
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, BLOCKR, LANES), plane.dtype),
            pltpu.VMEM((DEPTH, MAXU, LANES), jnp.int32),
            pltpu.VMEM((DEPTH, MAXU, LANES), plane.dtype),
            pltpu.SemaphoreType.DMA((DEPTH, 3)),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        input_output_aliases={4: 0},  # plane (after 2 scalar-prefetch args)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bids, starts, vbro, supd, plane)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def _stream_merge_set(plane, vrow, upd, mask, interpret):
    R = plane.shape[0]
    assert R % BLOCKR == 0, f"plane rows {R} must be a multiple of {BLOCKR}"
    nblocks = R // BLOCKR
    m = vrow.shape[0]
    key = jnp.where((vrow >= 0) & (vrow < R), vrow, _SENT)
    skey, order = jax.lax.sort((key, jnp.arange(m, dtype=jnp.int32)), num_keys=1)
    supd = jnp.take(upd.astype(plane.dtype), order, axis=0)
    smask = jnp.take(mask.astype(plane.dtype), order, axis=0)
    m_pad = m + MAXU
    skey = jnp.concatenate([skey, jnp.full((MAXU,), _SENT, jnp.int32)])
    supd = jnp.concatenate([supd, jnp.zeros((MAXU, LANES), supd.dtype)])
    smask = jnp.concatenate([smask, jnp.zeros((MAXU, LANES), smask.dtype)])
    vbro = jnp.broadcast_to(skey[:, None], (m_pad, LANES))

    max_steps = min(nblocks, m) + -(-m // STRIDE)
    bids, starts = _plan_windows(skey, m_pad, nblocks, max_steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # vbro
            pl.BlockSpec(memory_space=pltpu.ANY),  # supd
            pl.BlockSpec(memory_space=pltpu.ANY),  # smask
            pl.BlockSpec(memory_space=pltpu.ANY),  # plane
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, BLOCKR, LANES), plane.dtype),
            pltpu.VMEM((DEPTH, MAXU, LANES), jnp.int32),
            pltpu.VMEM((DEPTH, MAXU, LANES), plane.dtype),
            pltpu.VMEM((DEPTH, MAXU, LANES), plane.dtype),
            pltpu.SemaphoreType.DMA((DEPTH, 4)),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    return pl.pallas_call(
        _kernel_set,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        input_output_aliases={5: 0},  # plane (after 2 scalar-prefetch args)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bids, starts, vbro, supd, smask, plane)


def stream_merge_set(plane, vrow, upd, mask, interpret: bool = None) -> jax.Array:
    """plane[vrow[j], l] = upd[j, l] where mask[j, l] (lanes outside the mask
    keep their value), in place, touching only blocks that contain updates.
    Contract: within one storage row, contributing updates own DISJOINT lane
    masks (unique slots). vrow out of [0, R) drops the row."""
    R = plane.shape[0]
    if R % BLOCKR != 0 or R < 4 * BLOCKR:
        # small/unaligned planes: exact XLA mask-merge (cheap at that size);
        # duplicate vrows are combined first (disjoint lanes by contract)
        from meepoembedding_tpu.table.pallas_ops import combine_rows_by_vrow

        enabled = (vrow >= 0) & (vrow < R)
        both = jnp.concatenate(
            [upd.astype(jnp.float32), mask.astype(jnp.float32)], axis=1
        )
        ub, comb = combine_rows_by_vrow(vrow, both, enabled)
        newv, m = comb[:, :LANES], comb[:, LANES:] > 0
        old = jnp.take(plane, jnp.clip(ub, 0, R - 1), axis=0).astype(jnp.float32)
        merged = jnp.where(m, newv, old).astype(plane.dtype)
        idx = jnp.where(ub >= 0, ub, R)
        return plane.at[idx].set(merged, mode="drop", unique_indices=True)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _stream_merge_set(
        plane, vrow.astype(jnp.int32), upd, mask, interpret
    )


def stream_merge_add(plane, vrow, upd, interpret: bool = None) -> jax.Array:
    """plane[vrow[j]] += upd[j] for an [R, 128] plane, in place, touching only
    the blocks that contain updates. Duplicate vrows allowed (summed on the
    MXU); vrow < 0 or >= R drops the row. Planes smaller than / unaligned to
    BLOCKR fall back to the XLA scatter (cheap at that size)."""
    R = plane.shape[0]
    if R % BLOCKR != 0 or R < 4 * BLOCKR:
        idx = jnp.where((vrow >= 0) & (vrow < R), vrow, R)
        return plane.at[idx].add(upd.astype(plane.dtype), mode="drop")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _stream_merge_add(plane, vrow.astype(jnp.int32), upd, interpret)


# The kernel exists for planes XLA cannot update without a second buffer.
# Where that line sits moved between rounds, so it was RE-MEASURED (r4,
# v5e, bench_phases at the 2^27-slot bf16 config — 8.6 GB values plane,
# 11.3 GB total live, 219K updates/step):
#   XLA scatter-add, donated plane:  15.9 ms/step, NO OOM (in-place)
#   stream-merge kernel:             49.6 ms/step
# The kernel's cost is GRID-STEP-LATENCY-bound, not bandwidth-bound: with
# 219K random updates over plane_rows/BLOCKR blocks essentially every
# block is touched, and ~(blocks + windows) grid steps at ~3 us/step gave
# 22.3 ms at 4096 blocks (4.3 GB f32) and ~50 ms at 16384 blocks (8.6 GB
# bf16) — linear in block count, exactly as a per-step fixed cost
# predicts. XLA's scatter meanwhile proved in-place on donated planes at
# 8.6 GB (16 GB chip: a copy could not have fit alongside the 2.7 GB of
# key/score planes). The default threshold therefore sits at 12 GiB:
# every configuration that physically fits a 16 GB chip WITH its metadata
# planes uses the XLA scatter (33.5 ms/step faster at config 2); the
# kernel remains for the (12, ~13.5] GiB corner where a transient copy
# would OOM, and as the guaranteed-in-place fallback if a future XLA
# regresses donation aliasing (MEEPO_STREAM_THRESHOLD overrides).
STREAM_THRESHOLD_BYTES = int(
    __import__("os").environ.get("MEEPO_STREAM_THRESHOLD", 12 << 30)
)


def values_scatter_add(plane, vrow, upd) -> jax.Array:
    """Dispatch the [R,128] row scatter-add: XLA for small planes,
    stream-merge (in-place, O(touched blocks)) for big ones. vrow out of
    [0, R) drops the row."""
    R = plane.shape[0]
    if (
        plane.size * plane.dtype.itemsize >= STREAM_THRESHOLD_BYTES
        and R % BLOCKR == 0
    ):
        return stream_merge_add(plane, vrow, upd)
    idx = jnp.where((vrow >= 0) & (vrow < R), vrow, R)
    return plane.at[idx].add(upd.astype(plane.dtype), mode="drop")
