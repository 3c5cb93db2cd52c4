"""Raw Pallas row-kernel throughput vs XLA equivalents on the current device:
is DMA-pipelined random row access the win the design assumes? (SURVEY.md M1
hard part #1)."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, steps=20, bytes_moved=None):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    bw = f"  {bytes_moved / dt / 1e9:8.1f} GB/s" if bytes_moved else ""
    log(f"{name:40s} {dt * 1e3:9.3f} ms{bw}")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from meepoembedding_tpu.table.pallas_ops import row_gather, row_scatter_add

    R, n = 1 << 22, 1 << 19  # 4M rows of 128 lanes (2GB), 512K random rows
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
    idx = jnp.asarray(rng.choice(R, size=n, replace=False).astype(np.int32))
    upd = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    moved = n * 128 * 4

    log(f"plane [{R},128] f32 = {R * 512 / 1e9:.1f} GB; n={n}")
    timeit("jnp.take rows", jax.jit(lambda p, i: jnp.take(p, i, axis=0)), plane, idx,
           bytes_moved=moved)
    timeit("pallas row_gather", jax.jit(lambda p, i: row_gather(p, i)), plane, idx,
           bytes_moved=moved)
    timeit("XLA .at[].add unique", jax.jit(lambda p, i, u: p.at[i].add(u, mode="drop", unique_indices=True)),
           plane, idx, upd, bytes_moved=3 * moved)
    timeit("XLA .at[].set unique", jax.jit(lambda p, i, u: p.at[i].set(u, mode="drop", unique_indices=True)),
           plane, idx, upd, bytes_moved=moved)

    # donation variant for true in-place pallas scatter
    f = jax.jit(lambda p, i, u: row_scatter_add(p, i, u), donate_argnums=(0,))
    p2 = jnp.asarray(np.zeros((R, 128), np.float32))
    out = f(p2, idx, upd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(out, idx, upd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    log(f"{'pallas row_scatter_add (donated)':40s} {dt * 1e3:9.3f} ms  "
        f"{3 * moved / dt / 1e9:8.1f} GB/s")

    # sort throughput context
    big = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32))
    timeit("jnp.sort [512K] i32", jax.jit(jnp.sort), big)
    timeit("jnp.argsort [512K] i32", jax.jit(jnp.argsort), big)
    pair = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32))
    timeit("lexsort 2x[512K] i32", jax.jit(lambda a, b: jnp.lexsort((a, b))), big, pair)


if __name__ == "__main__":
    main()
