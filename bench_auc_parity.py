"""AUC-parity gate (BASELINE.json headline: "Criteo DLRM AUC [parity]").

Trains the DYNAMIC-table trainer and the STATIC fixed-vocab hash-trick
baseline (meepoembedding_tpu/baseline.py) on the SAME Criteo-format stream
with a planted CTR signal (no real dataset ships in this zero-egress image;
data/criteo.py:write_synthetic_criteo_signal generates realistic-scale
Criteo-format TSV), over >= 3 seeds, and reports train-stream AUC plus
held-out AUC for each. Parity = dynamic within the static baseline's
run-to-run spread. Results are recorded in BASELINE.md.

Env knobs: MEEPO_PARITY_LINES (default 400K train + 64K eval),
MEEPO_PARITY_SEEDS (default 3), MEEPO_PARITY_BATCH (default 2048).
"""

import json
import os
import sys
import tempfile


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np

    from meepoembedding_tpu.baseline import StaticEmbeddingTrainer
    from meepoembedding_tpu.config import (
        ModelConfig, OptimizerConfig, RunConfig, TableConfig,
    )
    from meepoembedding_tpu.data.criteo import (
        NUM_SPARSE, CriteoStream, write_synthetic_criteo_signal,
    )
    from meepoembedding_tpu.metrics import StreamingAUC
    from meepoembedding_tpu.train import Trainer

    train_lines = int(os.environ.get("MEEPO_PARITY_LINES", 400_000))
    eval_lines = 64_000
    seeds = int(os.environ.get("MEEPO_PARITY_SEEDS", 3))
    batch = int(os.environ.get("MEEPO_PARITY_BATCH", 2048))
    dim = 16
    vocab = 1 << 19  # static baseline rows (hash-trick, collisions expected)

    tsv = os.path.join(tempfile.gettempdir(), "meepo_parity.tsv")
    if not os.path.exists(tsv) or os.environ.get("MEEPO_PARITY_REGEN"):
        log(f"generating {train_lines + eval_lines} Criteo-format lines ...")
        write_synthetic_criteo_signal(tsv, train_lines + eval_lines, seed=7)

    train_steps = train_lines // batch
    eval_steps = eval_lines // batch

    model = ModelConfig(
        kind="dlrm", num_dense_features=13, num_sparse_features=NUM_SPARSE,
        embedding_dim=dim, bottom_mlp=(64, dim), top_mlp=(128, 64, 1),
    )

    def data(skip_to_eval=False):
        s = CriteoStream(tsv, batch_size=batch)
        it = s.batches(train_steps + eval_steps)
        if skip_to_eval:
            for _ in range(train_steps):
                next(it)
        return it

    results = {"dynamic": [], "static": []}
    for seed in range(seeds):
        run = RunConfig(
            batch_size=batch, steps=train_steps, seed=seed,
            dense_learning_rate=1e-3, log_every=10**9,
        )
        # --- dynamic table ---------------------------------------------------
        table = TableConfig(
            dim=dim, capacity=1 << 20,
            optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
        )
        tr = Trainer(run, table, model)
        it = data()
        for _ in range(train_steps):
            tr.train_step(next(it))
        ev = StreamingAUC()
        for _ in range(eval_steps):
            b = next(it)
            out = tr.eval_step(b)
            ev.update(out["logits"], np.asarray(b["label"]))
        results["dynamic"].append(
            {"seed": seed, "train_auc": tr.auc.compute(), "eval_auc": ev.compute(),
             "rows": len_rows(tr)}
        )
        log("dynamic", results["dynamic"][-1])

        # --- static fixed-vocab baseline ------------------------------------
        st = StaticEmbeddingTrainer(run, model, vocab_size=vocab, table_lr=0.05)
        it = data()
        for _ in range(train_steps):
            st.train_step(next(it))
        ev = StreamingAUC()
        for _ in range(eval_steps):
            b = next(it)
            out = st.eval_step(b)
            ev.update(out["logits"], np.asarray(b["label"]))
        results["static"].append(
            {"seed": seed, "train_auc": st.auc.compute(), "eval_auc": ev.compute()}
        )
        log("static ", results["static"][-1])

    d = np.array([r["eval_auc"] for r in results["dynamic"]])
    s = np.array([r["eval_auc"] for r in results["static"]])
    summary = {
        "metric": "criteo_format_eval_auc_dynamic_vs_static",
        "dynamic_mean": round(float(d.mean()), 5),
        "dynamic_std": round(float(d.std()), 5),
        "static_mean": round(float(s.mean()), 5),
        "static_std": round(float(s.std()), 5),
        "delta": round(float(d.mean() - s.mean()), 5),
        "parity": bool(abs(d.mean() - s.mean()) <= 2 * max(s.std(), 1e-4) + 1e-3),
        "runs": results,
    }
    print(json.dumps(summary))


def len_rows(tr):
    import numpy as np

    return int(np.asarray(tr.shard.cnt).sum())


if __name__ == "__main__":
    main()
