"""Random-row DMA floor microbench (VERDICT r4 missing #3 / next-#2).

The r4 residual budget rests on a claimed ~71 ns/row issue-bound floor for
random 512-byte row DMA on a v5e (BASELINE.md r2 optimization log). That
figure came from ONE Pallas formulation (pallas_ops.row_gather: BLK=256
descriptors per grid step, one semaphore per descriptor, 1 row per
descriptor). This bench PROVES or BREAKS the floor by sweeping the three
levers that could move it:

  W   ring depth — how many DMAs are in flight before the issue loop blocks
      on semaphore reuse (W == BLK reproduces start-all/wait-all).
  R   rows per descriptor — each descriptor copies R CONSECUTIVE rows from a
      random base. Random single rows can't be coalesced, but if ns/descriptor
      is ~flat in R, a layout that co-locates G hot rows per descriptor (or
      tolerates (R-1)/R over-fetch) divides the per-useful-row cost by G —
      the decision input for retuning the values scatter.
  dir gather (HBM row -> VMEM block) vs scatter (VMEM block -> HBM row,
      in-place via input_output_aliases) — write descriptors can price
      differently from reads.

Also times XLA's jnp.take on the same index stream as the compiler reference.

Timing uses the depth-lagged host-fetch barrier bench.py proved necessary
over the tunneled device (block_until_ready returns at dispatch there).

Prints one JSON line: ns_per_descriptor for every swept point, the best
achieved ns/row at R=1 (the floor), and the best ns/useful-row achievable
if over-fetch or layout batching were deployed.

Env: MEEPO_DMA_ROWS (plane rows, default 2^22), MEEPO_DMA_DESC (descriptors
per call, default 2^16), MEEPO_DMA_ITERS (default 12).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    nrow = int(os.environ.get("MEEPO_DMA_ROWS", 1 << 22))
    ndesc = int(os.environ.get("MEEPO_DMA_DESC", 1 << 16))
    iters = int(os.environ.get("MEEPO_DMA_ITERS", 8))
    REPEAT = int(os.environ.get("MEEPO_DMA_REPEAT", 8))
    BLK = 256  # descriptors per grid step (pallas_ops.row_gather's value)
    dev = jax.devices()[0]
    interpret = jax.default_backend() != "tpu"
    log(f"device: {dev.device_kind}, plane [{nrow},128] f32 "
        f"({nrow*512/1e9:.1f} GB), {ndesc} descriptors/call")

    plane = jnp.zeros((nrow, LANES), jnp.float32) + 0.5
    jax.block_until_ready(plane)
    rng = np.random.default_rng(0)
    # unique random rows per iteration (permutation chunks): descriptors in
    # one call never alias, so scatter timing is race-free
    idx_sets = []
    for _ in range(iters):
        p = rng.permutation(nrow)[: ndesc].astype(np.int32)
        idx_sets.append(jax.device_put(jnp.asarray(p)))
    jax.block_until_ready(idx_sets)

    def make_gather(R, W):
        def kernel(idx_ref, plane_ref, out_ref, sems):
            i = pl.program_id(0)

            def dma(j):
                row = jnp.clip(idx_ref[i * BLK + j], 0, nrow - R)
                return pltpu.make_async_copy(
                    plane_ref.at[pl.ds(row, R), :],
                    out_ref.at[pl.ds(j * R, R), :],
                    sems.at[j % W],
                )

            def body(j, _):
                @pl.when(j >= W)
                def _():
                    dma(j - W).wait()

                dma(j).start()
                return 0

            lax.fori_loop(0, BLK, body, 0, unroll=True)

            def tail(j, _):
                dma(j).wait()
                return 0

            lax.fori_loop(max(0, BLK - W), BLK, tail, 0, unroll=True)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ndesc // BLK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (BLK * R, LANES), lambda i, idx_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(W, BLK),))],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ndesc * R, LANES), jnp.float32),
            interpret=interpret,
        )

        # K kernel invocations per jitted call: the tunneled device costs
        # ~24 ms of WALL time per dispatch (measured: a take() of 65K and of
        # 1M rows both return in ~24 ms), so a single-kernel call measures
        # the dispatch floor, not the kernel. K calls inside one jit pay one
        # dispatch; idx is rotated per repeat so every repeat hits fresh
        # random rows.
        @jax.jit
        def run(idx):
            acc = jnp.float32(0)
            for k in range(REPEAT):
                out = call((idx + k * 7919) % (nrow - 32), plane)
                acc = acc + jnp.sum(out[0]) + jnp.sum(out[-1])
            return acc

        return run

    def make_scatter(R, W):
        def kernel(idx_ref, upd_ref, plane_ref, out_ref, sems):
            i = pl.program_id(0)

            def dma(j):
                row = jnp.clip(idx_ref[i * BLK + j], 0, nrow - R)
                return pltpu.make_async_copy(
                    upd_ref.at[pl.ds(j * R, R), :],
                    out_ref.at[pl.ds(row, R), :],
                    sems.at[j % W],
                )

            def body(j, _):
                @pl.when(j >= W)
                def _():
                    dma(j - W).wait()

                dma(j).start()
                return 0

            lax.fori_loop(0, BLK, body, 0, unroll=True)

            def tail(j, _):
                dma(j).wait()
                return 0

            lax.fori_loop(max(0, BLK - W), BLK, tail, 0, unroll=True)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ndesc // BLK,),
            in_specs=[
                pl.BlockSpec(
                    (BLK * R, LANES), lambda i, idx_ref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(W, BLK),))],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nrow, LANES), jnp.float32),
            # alias numbering includes the scalar-prefetch operand:
            # input[0]=idx, input[1]=upd, input[2]=plane
            input_output_aliases={2: 0},  # plane updated in place
            interpret=interpret,
        )
        upd = jnp.ones((ndesc * R, LANES), jnp.float32)

        @jax.jit
        def run(idx):
            acc = jnp.float32(0)
            p = plane
            for k in range(REPEAT):  # see make_gather: amortize the dispatch
                p = call((idx + k * 7919) % (nrow - 32), upd, p)
                acc = acc + p[0, 0]
            return acc

        return run

    def time_ns_per_desc(run, repeat=None):
        repeat = REPEAT if repeat is None else repeat
        accs = [run(idx_sets[0])]
        jax.block_until_ready(accs[0])  # compile
        d = 2
        best = float("inf")
        for _w in range(2):
            t0 = time.perf_counter()
            accs = []
            for i in range(iters):
                accs.append(run(idx_sets[i]))
                if i >= d:
                    float(accs[i - d])  # real fetch barrier
            float(accs[-1])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best / (ndesc * repeat) * 1e9

    results = {}
    R_SWEEP, W_SWEEP = (1, 2, 4, 8, 16, 32), (8, 32, 128, 256)
    for R in R_SWEEP:
        for W in W_SWEEP:
            key = f"gather_R{R}_W{W}"
            ns = time_ns_per_desc(make_gather(R, W))
            results[key] = round(ns, 1)
            log(f"{key}: {ns:.1f} ns/descriptor "
                f"({ns / R:.1f} ns/row if all {R} rows useful)")
    for R in (1, 4, 16):
        for W in (32, 256):
            key = f"scatter_R{R}_W{W}"
            ns = time_ns_per_desc(make_scatter(R, W))
            results[key] = round(ns, 1)
            log(f"{key}: {ns:.1f} ns/descriptor ({ns / R:.1f} ns/row)")

    # XLA reference on the same stream (same K-repeat dispatch amortization)
    @jax.jit
    def xla_take(idx):
        acc = jnp.float32(0)
        for k in range(REPEAT):
            out = jnp.take(plane, (idx + k * 7919) % (nrow - 32), axis=0)
            acc = acc + jnp.sum(out[0]) + jnp.sum(out[-1])
        return acc

    ns = time_ns_per_desc(xla_take)
    results["xla_take_R1"] = round(ns, 1)
    log(f"xla_take: {ns:.1f} ns/row")

    # the production kernel as shipped (pallas_ops.row_gather)
    from meepoembedding_tpu.table import pallas_ops

    @jax.jit
    def shipped(idx):
        acc = jnp.float32(0)
        for k in range(REPEAT):
            out = pallas_ops.row_gather(plane, (idx + k * 7919) % (nrow - 32))
            acc = acc + jnp.sum(out[0]) + jnp.sum(out[-1])
        return acc

    ns = time_ns_per_desc(shipped)
    results["row_gather_shipped"] = round(ns, 1)
    log(f"pallas_ops.row_gather: {ns:.1f} ns/row")

    floor_r1 = min(v for k, v in results.items() if k.startswith("gather_R1"))
    best_amortized = min(
        results[f"gather_R{R}_W{W}"] / R for R in R_SWEEP for W in W_SWEEP
    )
    print(json.dumps({
        "metric": "random_row_dma_ns_per_row",
        "value": floor_r1,
        "unit": "ns/row",
        "best_amortized_ns_per_row": round(best_amortized, 1),
        "xla_take_ns_per_row": results["xla_take_R1"],
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
