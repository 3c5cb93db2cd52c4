"""Pallas TPU kernels for the hot row ops (SURVEY.md C2/C3/C4, L0).

The reference class's CUDA kernels gather/scatter embedding rows with one
thread-block per row; the TPU equivalent is explicit DMA pipelining: keep a
block of row-granularity HBM<->VMEM copies in flight so random-access row
traffic approaches HBM bandwidth instead of XLA's gather/scatter lowering
(which on TPU serializes general scatters to ~200ns/element and runs row
gathers far below DMA speed).

  row_gather          out[j] = plane[idx[j]]        (any [R, 128] plane)
  row_scatter_add     plane[idx[j]] += upd[j]       (REQUIRES unique idx;
                      in-place via input_output_aliases — no table copy)
  row_scatter_set     plane[idx[j]] = merge(old, upd[j]) by lane mask
                      (REQUIRES unique idx; in-place RMW)

Row indices ride scalar prefetch (SMEM) so DMA addresses are known before
the body runs. SMEM is ~1 MiB, so wrappers split big batches into chunks of
CHUNK indices per pallas_call (the calls chain in one jit; the scatter plane
is donated through the chain, staying in place). Unique-index preconditions
are guaranteed by callers: slots are deduped, and packed storage rows are
pre-combined (`combine_rows_by_vrow`).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meepoembedding_tpu.config import LANES

BLK = 256  # rows per grid step; BLK outstanding DMAs per phase
CHUNK = 1 << 16  # idx per pallas_call: 256 KiB of SMEM, safely under ~1 MiB


def _pad_rows(idx, *upds):
    n = idx.shape[0]
    n_pad = -(-n // BLK) * BLK
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.full((n_pad - n,), -1, jnp.int32)])
        upds = tuple(
            jnp.concatenate([u, jnp.zeros((n_pad - n,) + u.shape[1:], u.dtype)])
            for u in upds
        )
    return (idx,) + upds + (n,)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- gather -------------------------------------------------------------------

def _gather_kernel(idx_ref, plane_ref, out_ref, sems):
    i = pl.program_id(0)

    def dma(j):
        row = jnp.clip(idx_ref[i * BLK + j], 0, plane_ref.shape[0] - 1)
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(row, 1), :], out_ref.at[pl.ds(j, 1), :], sems.at[j]
        )

    def start(j, _):
        dma(j).start()
        return 0

    jax.lax.fori_loop(0, BLK, start, 0)

    def wait(j, _):
        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, BLK, wait, 0)


def _gather_chunk(plane, idx_pad, interpret):
    npad = idx_pad.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (BLK, LANES), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, LANES), plane.dtype),
        interpret=interpret,
    )(idx_pad, plane)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_gather(plane, idx, interpret):
    idx, n = _pad_rows(idx.astype(jnp.int32))
    outs = [
        _gather_chunk(plane, idx[o : o + CHUNK], interpret)
        for o in range(0, idx.shape[0], CHUNK)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out[:n]


def row_gather(plane: jax.Array, idx: jax.Array, interpret: bool = None) -> jax.Array:
    """out[j] = plane[clip(idx[j])]; [n] rows from an [R, 128] plane."""
    if interpret is None:
        interpret = _default_interpret()
    return _row_gather(plane, idx, interpret)


# --- scatter RMW (in-place, unique rows) ---------------------------------------
#
# Pipeline per grid step i (two slabs, parity i % 2):
#   drain writes of step i-2 (slab reuse safety) -> start+wait reads of step i
#   -> combine in VMEM -> start writes of step i. Unique rows guarantee no
#   read-of-unwritten-row hazards ACROSS steps. idx < 0 drops the write.

def _scatter_kernel_body(idx_ref, plane_ref, out_ref, slab, rsem, wsem, combine):
    i = pl.program_id(0)
    par = i % 2
    nsteps = pl.num_programs(0)

    def write_dma(step, j):
        row = jnp.clip(idx_ref[step * BLK + j], 0, out_ref.shape[0] - 1)
        return pltpu.make_async_copy(
            slab.at[step % 2, pl.ds(j, 1), :],
            out_ref.at[pl.ds(row, 1), :],
            wsem.at[step % 2, j],
        )

    def read_dma(j):
        row = jnp.clip(idx_ref[i * BLK + j], 0, out_ref.shape[0] - 1)
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(row, 1), :], slab.at[par, pl.ds(j, 1), :], rsem.at[j]
        )

    def drain_writes(step):
        def drain(j, _):
            @pl.when(idx_ref[step * BLK + j] >= 0)
            def _():
                write_dma(step, j).wait()

            return 0

        jax.lax.fori_loop(0, BLK, drain, 0)

    # Reusing this parity's slab: step i-2's writes must have landed.
    @pl.when(i >= 2)
    def _():
        drain_writes(i - 2)

    def start_read(j, _):
        read_dma(j).start()
        return 0

    jax.lax.fori_loop(0, BLK, start_read, 0)

    def wait_read(j, _):
        read_dma(j).wait()
        return 0

    jax.lax.fori_loop(0, BLK, wait_read, 0)

    combine(par)

    def start_write(j, _):
        @pl.when(idx_ref[i * BLK + j] >= 0)
        def _():
            write_dma(i, j).start()

        return 0

    jax.lax.fori_loop(0, BLK, start_write, 0)

    # Tail: the last two steps drain their own writes before the kernel ends.
    @pl.when(i >= nsteps - 2)
    def _():
        drain_writes(i)


def _scatter_add_kernel(idx_ref, upd_ref, plane_ref, out_ref, slab, rsem, wsem):
    def combine(par):
        @pl.when(par == 0)
        def _():
            slab[0] = slab[0] + upd_ref[:].astype(slab.dtype)

        @pl.when(par == 1)
        def _():
            slab[1] = slab[1] + upd_ref[:].astype(slab.dtype)

    _scatter_kernel_body(idx_ref, plane_ref, out_ref, slab, rsem, wsem, combine)


def _scatter_set_kernel(idx_ref, upd_ref, mask_ref, plane_ref, out_ref, slab, rsem, wsem):
    def combine(par):
        m = mask_ref[:]

        @pl.when(par == 0)
        def _():
            slab[0] = jnp.where(m, upd_ref[:].astype(slab.dtype), slab[0])

        @pl.when(par == 1)
        def _():
            slab[1] = jnp.where(m, upd_ref[:].astype(slab.dtype), slab[1])

    _scatter_kernel_body(idx_ref, plane_ref, out_ref, slab, rsem, wsem, combine)


def _scatter_chunk(kernel, plane, idx_pad, *vmem_inputs, interpret):
    npad = idx_pad.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, LANES), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM)
            for _ in vmem_inputs
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLK, LANES), plane.dtype),
            pltpu.SemaphoreType.DMA((BLK,)),
            pltpu.SemaphoreType.DMA((2, BLK)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        input_output_aliases={1 + len(vmem_inputs): 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx_pad, *vmem_inputs, plane)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def _row_scatter_add(plane, idx, upd, interpret):
    idx, upd, _n = _pad_rows(idx.astype(jnp.int32), upd.astype(plane.dtype))
    for o in range(0, idx.shape[0], CHUNK):
        plane = _scatter_chunk(
            _scatter_add_kernel, plane, idx[o : o + CHUNK], upd[o : o + CHUNK],
            interpret=interpret,
        )
    return plane


def row_scatter_add(plane, idx, upd, interpret: bool = None) -> jax.Array:
    """plane[idx[j]] += upd[j], in place. idx MUST be unique (or < 0 to drop);
    duplicates would race across pipelined read-modify-writes."""
    if interpret is None:
        interpret = _default_interpret()
    return _row_scatter_add(plane, idx, upd, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def _row_scatter_set(plane, idx, upd, mask, interpret):
    idx, upd, mask, _n = _pad_rows(
        idx.astype(jnp.int32), upd.astype(plane.dtype), mask
    )
    for o in range(0, idx.shape[0], CHUNK):
        plane = _scatter_chunk(
            _scatter_set_kernel, plane, idx[o : o + CHUNK], upd[o : o + CHUNK],
            mask[o : o + CHUNK], interpret=interpret,
        )
    return plane


def row_scatter_set(plane, idx, upd, mask, interpret: bool = None) -> jax.Array:
    """plane[idx[j], l] = upd[j, l] where mask[j, l], else unchanged (RMW).
    idx MUST be unique; idx[j] < 0 drops the row entirely."""
    if interpret is None:
        interpret = _default_interpret()
    return _row_scatter_set(plane, idx, upd, mask.astype(jnp.bool_), interpret)


# --- helper: make storage-row updates unique ---------------------------------

# numpy, NOT jnp: a module-level jax Array constant can be hoisted as a
# leading program parameter ahead of donated buffers (see stream_merge._SENT)
_SENT = np.int32(2**31 - 1)


def combine_rows_by_vrow(vrow: jax.Array, rowupd: jax.Array, enabled: jax.Array):
    """Combine duplicate storage-row updates (slots sharing a packed row) so
    unique-index scatters are race-free. Returns (uvrow [n], combined
    [n, 128]): group g's total update at position g, disabled groups / tail
    slots marked uvrow == -1. Scatter-add-free (see dedup.sorted_run_sums).

    Callers guarantee lane-DISJOINT contributions within a group (slots are
    unique, and slots sharing a storage row own disjoint lane windows), which
    makes the float combine BIT-EXACT (byte-plane integer summation) — table
    writes carry no batch-global cumsum rounding."""
    from meepoembedding_tpu.ops.dedup import sorted_run_sums

    key = jnp.where(enabled, vrow, _SENT)
    order = jnp.argsort(key)
    ks = jnp.take(key, order)
    us = jnp.take(rowupd, order, axis=0)
    gkey, combined, live = sorted_run_sums(ks, us, disjoint=True)
    return jnp.where(live & (gkey != _SENT), gkey, -1), combined
