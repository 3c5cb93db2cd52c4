"""Pallas TPU kernels for the hot row ops (SURVEY.md C2/C3/C4, L0).

The reference class's CUDA kernels gather/scatter embedding rows with one
thread-block per row; the TPU equivalent is explicit DMA pipelining: keep
dozens of row-granularity HBM<->VMEM copies in flight so random-access row
traffic approaches HBM bandwidth instead of XLA's conservative
gather/scatter lowering (which inserts whole-array copies for WAR hazards
and serializes on potential index duplicates).

  row_gather        out[j] = plane[idx[j]]          (any [R, 128] plane)
  row_scatter_add   plane[idx[j]] += upd[j]         (REQUIRES unique idx;
                    in-place via input_output_aliases — no table copy)

Both use PrefetchScalarGridSpec so the row indices are available in SMEM
before the body runs, a grid over row blocks, and a DMA-semaphore ring of
BLK outstanding copies per step. Unique-index precondition for scatter is
guaranteed by callers: slots are deduped, and packed storage rows are
pre-combined (`combine_rows_by_vrow`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meepoembedding_tpu.config import LANES

BLK = 256  # rows per grid step; BLK outstanding DMAs per phase


def _pad_rows(idx, upd=None):
    n = idx.shape[0]
    n_pad = -(-n // BLK) * BLK
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.full((n_pad - n,), -1, jnp.int32)])
        if upd is not None:
            upd = jnp.concatenate(
                [upd, jnp.zeros((n_pad - n,) + upd.shape[1:], upd.dtype)]
            )
    return idx, upd, n


# --- gather -------------------------------------------------------------------

def _gather_kernel(idx_ref, plane_ref, out_ref, sems):
    i = pl.program_id(0)

    def start(j, _):
        row = idx_ref[i * BLK + j]
        row = jnp.clip(row, 0, plane_ref.shape[0] - 1)
        pltpu.make_async_copy(
            plane_ref.at[pl.ds(row, 1), :], out_ref.at[pl.ds(j, 1), :], sems.at[j]
        ).start()
        return 0

    jax.lax.fori_loop(0, BLK, start, 0)

    def wait(j, _):
        row = idx_ref[i * BLK + j]
        row = jnp.clip(row, 0, plane_ref.shape[0] - 1)
        pltpu.make_async_copy(
            plane_ref.at[pl.ds(row, 1), :], out_ref.at[pl.ds(j, 1), :], sems.at[j]
        ).wait()
        return 0

    jax.lax.fori_loop(0, BLK, wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_gather(plane: jax.Array, idx: jax.Array, interpret: bool = False) -> jax.Array:
    """out[j] = plane[clip(idx[j])]; [n] rows from an [R, 128] plane."""
    idx, _, n = _pad_rows(idx.astype(jnp.int32))
    npad = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (BLK, LANES), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, LANES), plane.dtype),
        interpret=interpret,
    )(idx, plane)
    return out[:n]


# --- scatter-add (in-place, unique rows) -------------------------------------

def _scatter_add_kernel(idx_ref, upd_ref, plane_ref, out_ref, slab, rsem, wsem):
    # out_ref aliases plane_ref's buffer (input_output_aliases): true in-place.
    i = pl.program_id(0)
    par = i % 2  # two slabs: overlap this step's reads with last step's writes
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

    # Reusing this slab: step i-2's writes must have landed.
    @pl.when(i >= 2)
    def _():
        drain_writes(i - 2)

    def start_read(j, _):
        read_dma(j).start()
        return 0

    def wait_read(j, _):
        read_dma(j).wait()
        return 0

    jax.lax.fori_loop(0, BLK, start_read, 0)
    jax.lax.fori_loop(0, BLK, wait_read, 0)

    @pl.when(par == 0)
    def _():
        slab[0] = slab[0] + upd_ref[:].astype(slab.dtype)

    @pl.when(par == 1)
    def _():
        slab[1] = slab[1] + upd_ref[:].astype(slab.dtype)

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


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def row_scatter_add(
    plane: jax.Array, idx: jax.Array, upd: jax.Array, interpret: bool = False
) -> jax.Array:
    """plane[idx[j]] += upd[j], in place. idx MUST be unique (or < 0 to drop);
    duplicates would race across pipelined read-modify-writes."""
    idx, upd, _n = _pad_rows(idx.astype(jnp.int32), upd)
    npad = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // BLK,),
        in_specs=[
            pl.BlockSpec(
                (BLK, LANES), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLK, LANES), plane.dtype),
            pltpu.SemaphoreType.DMA((BLK,)),
            pltpu.SemaphoreType.DMA((2, BLK)),
        ],
    )
    return pl.pallas_call(
        _scatter_add_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        input_output_aliases={2: 0},  # plane (arg index incl. scalar prefetch)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, upd, plane)


# --- helper: make storage-row updates unique ---------------------------------

_SENT = jnp.int32(2**31 - 1)


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
