"""Multi-host worker for tests (SURVEY.md §4.4): one process of an N-process
jax.distributed CPU job running the ShardedTrainer. Prints one JSON line with
the final state; exits nonzero on failure.

Usage: python tests/_mh_worker.py PORT PID NPROC DEVS_PER_PROC CKPT_DIR
           [--steps N] [--restore DIR] [--die-after N] [--save-every N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("port")
    ap.add_argument("pid", type=int)
    ap.add_argument("nproc", type=int)
    ap.add_argument("devs", type=int)
    ap.add_argument("ckpt_dir")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--restore", default=None)
    ap.add_argument("--die-after", type=int, default=0)
    ap.add_argument("--save-every", type=int, default=0)
    ap.add_argument("--col", type=int, default=1,
                    help="column shards: 2-D (rows x col) grid over all devices")
    ap.add_argument("--capacity", type=int, default=1 << 12)
    ap.add_argument("--grow-at", type=float, default=0.0,
                    help="table.grow_at_load: lockstep distributed growth")
    ap.add_argument("--erase", type=int, default=0,
                    help="after training, remove ids [0, N) via the "
                         "distributed exchange_erase (1-D trainer only)")
    ap.add_argument("--group", action="store_true",
                    help="heterogeneous 2-table ShardedGroupTrainer instead "
                         "of the single-table trainer")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={args.devs}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    jax.distributed.initialize(
        f"127.0.0.1:{args.port}", num_processes=args.nproc, process_id=args.pid
    )
    S = args.nproc * args.devs
    assert jax.device_count() == S

    from meepoembedding_tpu.config import ModelConfig, RunConfig, TableConfig
    from meepoembedding_tpu.parallel.mesh import make_mesh
    from meepoembedding_tpu.parallel.trainer import ShardedTrainer

    rows = S // args.col
    global_batch = 16 * rows
    # synchronous per-step losses: workers print them for cross-run parity
    run = RunConfig(batch_size=global_batch, steps=args.steps, pipeline_depth=0)
    table = TableConfig(dim=8, capacity=args.capacity,
                        grow_at_load=args.grow_at or None)
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=3,
        embedding_dim=8, top_mlp=(16, 1),
    )
    if args.group:
        from meepoembedding_tpu.group_train import ShardedGroupTrainer

        tables = {
            "user": TableConfig(dim=8, capacity=args.capacity,
                                grow_at_load=args.grow_at or None),
            "item": TableConfig(dim=16, capacity=args.capacity),
        }
        model = ModelConfig(kind="ctr_mlp", num_dense_features=4,
                            num_sparse_features=3, top_mlp=(16, 1))
        tr = ShardedGroupTrainer(run, tables, ["user", "item", "item"],
                                 model, mesh=make_mesh(S))
    elif args.col > 1:
        from meepoembedding_tpu.parallel.colsharded import (
            ColShardedTrainer, make_mesh2d,
        )

        tr = ColShardedTrainer(run, table, model, make_mesh2d(rows, args.col))
    else:
        tr = ShardedTrainer(run, table, model, mesh=make_mesh(S))
    if args.restore:
        tr.load_checkpoint(args.restore)

    local_b = global_batch // args.nproc

    def local_batch(step):
        # deterministic per (step, host): every host feeds ITS slice
        r = np.random.default_rng(1000 * step + args.pid)
        return {
            "dense": r.normal(size=(local_b, 4)).astype(np.float32),
            "ids": r.integers(0, 4000, size=(local_b, 3), dtype=np.int64),
            "label": (r.random(local_b) < 0.3).astype(np.float32),
        }

    def save():
        if args.group:
            tr.save_checkpoint(args.ckpt_dir)
        else:
            tr.save_checkpoint(args.ckpt_dir, extras={"saved_at": tr.step})

    start = tr.step
    losses = []
    for i in range(args.steps):
        out = tr.train_step(local_batch(start + i))
        losses.append(out["loss"])
        if args.save_every and (i + 1) % args.save_every == 0:
            save()
        if args.die_after and (i + 1) >= args.die_after:
            print(json.dumps({"died": True, "step": tr.step}), flush=True)
            os._exit(42)  # simulated hard worker failure (SURVEY.md §5)
    removed = 0
    if args.erase:
        # every process passes the SAME id list; owner-side dedup collapses
        # the copies and each key dies on exactly one shard
        ids = np.arange(args.erase, dtype=np.int64)
        removed = tr.remove("user", ids) if args.group else tr.remove(ids)
    save()
    if args.group:
        c = tr.counters()
        out = {
            "pid": args.pid, "step": tr.step, "loss": losses[-1],
            "removed": removed,
            "rows": {n: c[n]["rows"] for n in sorted(c)},
            "capacity": {n: tr.specs[n].capacity * tr.S for n in sorted(c)},
            "counters": c,
        }
    else:
        out = {
            "pid": args.pid, "rows": len(tr), "step": tr.step,
            "loss": losses[-1], "removed": removed,
            "capacity": tr.spec.capacity, "counters": tr.counters(),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
