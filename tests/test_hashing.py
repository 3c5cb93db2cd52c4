import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.table import hashing


def test_split_join_roundtrip(rng):
    ids = rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64)
    ids = np.concatenate([ids, np.array([0, -1, 1, 2**40, -(2**40)], np.int64)])
    hi, lo = hashing.split_ids(ids)
    back = hashing.join_ids(hi, lo)
    np.testing.assert_array_equal(back, ids)


def test_sentinel_is_invalid():
    hi, lo = hashing.split_ids(np.array([hashing.EMPTY_ID, 5], np.int64))
    v = hashing.is_valid(jnp.asarray(hi), jnp.asarray(lo))
    assert not bool(v[0]) and bool(v[1])


def test_hash_distribution(rng):
    ids = rng.integers(0, 2**62, size=20000, dtype=np.int64)
    hi, lo = hashing.split_ids(ids)
    b = hashing.bucket_of(jnp.asarray(hi), jnp.asarray(lo), 64)
    counts = np.bincount(np.asarray(b), minlength=64)
    # ~312 per bucket; chi-square-ish sanity bound
    assert counts.min() > 200 and counts.max() < 450


def test_owner_of_range(rng):
    ids = rng.integers(0, 2**62, size=5000, dtype=np.int64)
    hi, lo = hashing.split_ids(ids)
    for s in (1, 2, 3, 8, 12):
        o = np.asarray(hashing.owner_of(jnp.asarray(hi), jnp.asarray(lo), s))
        assert o.min() >= 0 and o.max() < s
        if s > 1:
            counts = np.bincount(o, minlength=s)
            assert counts.min() > 0.5 * len(ids) / s


def test_sequential_ids_spread():
    # CTR ids are often sequential per feature; hashing must still spread them
    ids = np.arange(10000, dtype=np.int64)
    hi, lo = hashing.split_ids(ids)
    b = np.asarray(hashing.bucket_of(jnp.asarray(hi), jnp.asarray(lo), 128))
    counts = np.bincount(b, minlength=128)
    assert counts.max() < 3 * counts.mean()


def test_default_rows_deterministic_and_bounded():
    ids = np.array([7, 7, 99, -(2**55)], np.int64)
    hi, lo = hashing.split_ids(ids)
    r1 = hashing.default_rows(jnp.asarray(hi), jnp.asarray(lo), 16, 0.05)
    r2 = hashing.default_rows(jnp.asarray(hi), jnp.asarray(lo), 16, 0.05)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r1[1]))
    assert not np.allclose(np.asarray(r1[0]), np.asarray(r1[2]))
    assert np.abs(np.asarray(r1)).max() <= 0.05
    z = hashing.default_rows(jnp.asarray(hi), jnp.asarray(lo), 16, 0.0)
    assert np.all(np.asarray(z) == 0)


class TestInitializerKinds:
    def test_kinds_shape_and_stats(self, rng):
        import jax.numpy as jnp

        from meepoembedding_tpu.table import hashing

        ids = rng.integers(1, 10**12, size=20000, dtype=np.int64)
        hi, lo = hashing.split_ids(ids)
        hi, lo = jnp.asarray(hi), jnp.asarray(lo)
        u = np.asarray(hashing.default_rows(hi, lo, 8, 0.1, kind="uniform"))
        n = np.asarray(hashing.default_rows(hi, lo, 8, 0.1, kind="normal"))
        t = np.asarray(hashing.default_rows(hi, lo, 8, 0.1, kind="truncated_normal"))
        c = np.asarray(hashing.default_rows(hi, lo, 8, 0.1, kind="constant"))
        assert np.abs(u).max() <= 0.1
        assert np.abs(n.std() - 0.1) < 0.005  # sigma == scale
        assert np.abs(t).max() <= 0.2 + 1e-6  # exact +-2 sigma truncation
        assert np.abs(t.std() - 0.1 * 0.8796) < 0.005  # truncated sigma
        np.testing.assert_array_equal(c, np.float32(0.1))
        # deterministic: same keys -> same bits
        n2 = np.asarray(hashing.default_rows(hi, lo, 8, 0.1, kind="normal"))
        np.testing.assert_array_equal(n, n2)

    def test_lane_offset_composes_for_all_kinds(self, rng):
        import jax.numpy as jnp

        from meepoembedding_tpu.table import hashing

        ids = rng.integers(1, 10**12, size=64, dtype=np.int64)
        hi, lo = hashing.split_ids(ids)
        hi, lo = jnp.asarray(hi), jnp.asarray(lo)
        for kind in ("uniform", "normal", "truncated_normal"):
            full = np.asarray(hashing.default_rows(hi, lo, 16, 0.05, kind=kind))
            a = np.asarray(hashing.default_rows(hi, lo, 8, 0.05, kind=kind))
            b = np.asarray(
                hashing.default_rows(hi, lo, 8, 0.05, lane_offset=8, kind=kind)
            )
            np.testing.assert_array_equal(full, np.concatenate([a, b], axis=1))

    def test_bad_kind_raises(self, rng):
        import jax.numpy as jnp
        import pytest as _pytest

        from meepoembedding_tpu.table import hashing

        with _pytest.raises(ValueError):
            hashing.default_rows(jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                                 4, 0.1, kind="xavier")


def test_normal_init_oracle_parity(rng):
    """Device table with a normal initializer matches the oracle (the init
    kind threads through lookup_train / find_or_insert / restore)."""
    import jax.numpy as jnp

    from meepoembedding_tpu.config import TableConfig
    from meepoembedding_tpu.table.oracle import OracleTable
    from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable

    cfg = TableConfig(dim=8, capacity=128 * 16, initializer_scale=0.05,
                      initializer="truncated_normal")
    t = DynamicEmbeddingTable(cfg)
    o = OracleTable(8, 0.05, cfg.optimizer, init_kind="truncated_normal")
    ids = rng.integers(1, 10**12, size=200, dtype=np.int64)
    np.testing.assert_allclose(
        np.asarray(t.lookup(ids)), o.lookup(ids, step=0), atol=5e-6
    )
