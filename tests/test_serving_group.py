"""Group-checkpoint online scoring (serving_group.GroupScoringService):
probe-only multi-table serving, single-device and row-sharded, behind the
same HTTP surface as the single-table services."""

import json
import socket
import threading
import urllib.request

import numpy as np

from meepoembedding_tpu.config import ModelConfig, OptimizerConfig, RunConfig, TableConfig
from meepoembedding_tpu.group_train import GroupTrainer
from meepoembedding_tpu.parallel.mesh import make_mesh
from meepoembedding_tpu.serving_group import GroupScoringService

B = 64
TABLES = {
    "user": TableConfig(
        dim=8, capacity=1 << 12, initializer_scale=0.05,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    ),
    "item": TableConfig(
        dim=16, capacity=1 << 12, initializer_scale=0.05,
        optimizer=OptimizerConfig(kind="ftrl", learning_rate=0.05),
    ),
}
FEATURES = ["user", "item", "item"]
MODEL = ModelConfig(kind="ctr_mlp", num_dense_features=3,
                    num_sparse_features=3, top_mlp=(16, 1))
RUN = RunConfig(batch_size=B, steps=6, seed=0, dense_learning_rate=3e-3)


def _batch(rng):
    return {
        "ids": np.stack([
            rng.integers(0, 500, size=B),
            rng.integers(0, 200, size=B),
            rng.integers(0, 200, size=B),
        ], axis=1).astype(np.int64),
        "dense": rng.normal(size=(B, 3)).astype(np.float32) * 0.1,
        "label": rng.integers(0, 2, size=B).astype(np.float32),
    }


def _train_group_ckpt(tmp_path):
    tr = GroupTrainer(RUN, TABLES, FEATURES, MODEL)
    rng = np.random.default_rng(0)
    for _ in range(6):
        tr.train_step(_batch(rng))
    tr.save_checkpoint(str(tmp_path / "gck"))
    return str(tmp_path / "gck")


def test_group_scoring_single_vs_sharded(tmp_path):
    """The sharded group service must score the same checkpoint identically
    to the single-device group service, ragged batches included."""
    ck = _train_group_ckpt(tmp_path)
    single = GroupScoringService(ck, RUN, TABLES, FEATURES, MODEL)
    sharded = GroupScoringService(
        ck, RUN, TABLES, FEATURES, MODEL, distributed=True, mesh=make_mesh()
    )
    assert sharded.S == 8
    assert single.stats()["rows"] == sharded.stats()["rows"] > 0
    rng = np.random.default_rng(1)
    for b in (64, 13):
        dense = rng.normal(size=(b, 3)).astype(np.float32)
        ids = rng.integers(0, 800, size=(b, 3)).astype(np.int64)
        p1 = single.score(dense, ids)
        p2 = sharded.score(dense, ids)
        assert p1.shape == p2.shape == (b,)
        np.testing.assert_allclose(p1, p2, rtol=2e-5, atol=2e-6)
    assert sharded.route_drops == 0


def test_group_scoring_http(tmp_path):
    ck = _train_group_ckpt(tmp_path)
    from meepoembedding_tpu.serving import make_http_server

    svc = GroupScoringService(ck, RUN, TABLES, FEATURES, MODEL)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = make_http_server(svc, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        h = json.loads(urllib.request.urlopen(base + "/healthz", timeout=30).read())
        assert h["ok"] and h["rows"] > 0 and set(h["tables"]) == {"user", "item"}
        req = json.dumps({
            "dense": [[0.1] * 3] * 3,
            "ids": [[1, 2, 3], [4, 5, 6], [7, 8, 9]],
        }).encode()
        r = json.loads(urllib.request.urlopen(
            urllib.request.Request(base + "/score", data=req,
                                   headers={"Content-Type": "application/json"}),
            timeout=120,
        ).read())
        assert len(r["scores"]) == 3
        assert all(0.0 <= p <= 1.0 for p in r["scores"])
        m = urllib.request.urlopen(base + "/metrics", timeout=30).read().decode()
        assert 'meepo_table_rows_total{table="user"}' in m
    finally:
        srv.shutdown()
        t.join(timeout=10)
