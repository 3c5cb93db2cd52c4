"""Backend conformance suite (SURVEY.md §4.5): one set of semantics tests run
against EVERY registered KVBackend (C6 host C++, C6 python oracle, C8 disk,
C7 remote/RESP) — the "and other backends" plugin contract of README.md:2."""

import numpy as np
import pytest

from meepoembedding_tpu.backends import KVBackend, available_backends, make_backend

WIDTH = 10


@pytest.fixture(params=["host", "python", "disk", "redis"])
def backend(request, tmp_path):
    name = request.param
    if name == "disk":
        b = make_backend("disk", width=WIDTH, path=str(tmp_path / "kv.log"))
        yield b
        b.close()
    elif name == "redis":
        from tests.fake_resp import FakeRespServer

        srv = FakeRespServer()
        b = make_backend("redis", width=WIDTH, port=srv.port)
        yield b
        b.close()
        srv.close()
    else:
        yield make_backend(name, width=WIDTH)


def _rows(rng, n):
    return rng.normal(size=(n, WIDTH)).astype(np.float32)


def test_registry_lists_all():
    assert {"host", "python", "disk", "redis"} <= set(available_backends())


def test_registry_unknown_raises():
    with pytest.raises(KeyError):
        make_backend("nope", width=4)


def test_protocol_conformance(backend):
    assert isinstance(backend, KVBackend)


def test_insert_lookup_roundtrip(backend, rng):
    keys = rng.choice(2**62, size=200, replace=False).astype(np.int64) - 2**61
    rows = _rows(rng, 200)
    backend.insert_batch(keys, rows)
    assert len(backend) == 200
    out, found = backend.lookup_batch(keys)
    assert found.all()
    np.testing.assert_array_equal(out, rows)


def test_missing_keys_zero_rows(backend, rng):
    backend.insert_batch(np.array([1, 2], np.int64), _rows(rng, 2))
    out, found = backend.lookup_batch(np.array([1, 99, 2, 98], np.int64))
    np.testing.assert_array_equal(found, [True, False, True, False])
    assert (out[1] == 0).all() and (out[3] == 0).all()


def test_overwrite_last_wins(backend, rng):
    keys = np.array([7, 8, 7], np.int64)
    rows = _rows(rng, 3)
    backend.insert_batch(keys, rows)
    assert len(backend) == 2
    out, found = backend.lookup_batch(np.array([7, 8], np.int64))
    assert found.all()
    np.testing.assert_array_equal(out[0], rows[2])  # later duplicate wins
    np.testing.assert_array_equal(out[1], rows[1])


def test_erase(backend, rng):
    keys = np.arange(50, dtype=np.int64) * 1000003
    backend.insert_batch(keys, _rows(rng, 50))
    gone = backend.erase_batch(keys[::2])
    assert gone.all()
    assert len(backend) == 25
    again = backend.erase_batch(keys[::2])
    assert not again.any()
    _, found = backend.lookup_batch(keys)
    np.testing.assert_array_equal(found, np.arange(50) % 2 == 1)


def test_export_streams_everything(backend, rng):
    keys = rng.choice(2**40, size=300, replace=False).astype(np.int64)
    rows = _rows(rng, 300)
    backend.insert_batch(keys, rows)
    got = {}
    for ks, rs in backend.export(chunk=64):
        for k, r in zip(ks, rs):
            got[int(k)] = r
    assert set(got) == set(int(k) for k in keys)
    order = np.argsort(keys)
    for i in order:
        np.testing.assert_array_equal(got[int(keys[i])], rows[i])


def test_negative_and_extreme_keys(backend, rng):
    keys = np.array([-1, 0, 2**62, -(2**62), 2**63 - 1, -(2**63) + 1], np.int64)
    rows = _rows(rng, len(keys))
    backend.insert_batch(keys, rows)
    out, found = backend.lookup_batch(keys)
    assert found.all()
    np.testing.assert_array_equal(out, rows)


def test_sentinel_key_skipped(backend, rng):
    keys = np.array([5, -(2**63), 6], np.int64)  # middle is the reserved pad id
    backend.insert_batch(keys, _rows(rng, 3))
    assert len(backend) == 2
    _, found = backend.lookup_batch(np.array([-(2**63)], np.int64))
    assert not found.any()


def test_clear(backend, rng):
    backend.insert_batch(np.arange(10, dtype=np.int64), _rows(rng, 10))
    backend.clear()
    assert len(backend) == 0


def test_large_batch(backend, rng):
    n = 50000
    keys = rng.choice(2**50, size=n, replace=False).astype(np.int64)
    rows = _rows(rng, n)
    backend.insert_batch(keys, rows)
    assert len(backend) == n
    out, found = backend.lookup_batch(keys[: n // 2])
    assert found.all()
    np.testing.assert_array_equal(out, rows[: n // 2])


# --- backend-specific behaviors ----------------------------------------------

def test_host_grow_rehash(rng):
    b = make_backend("host", width=4, capacity_hint=16)
    keys = np.arange(5000, dtype=np.int64) * 7919
    rows = rng.normal(size=(5000, 4)).astype(np.float32)
    for o in range(0, 5000, 500):  # interleave inserts and erases across growth
        b.insert_batch(keys[o : o + 500], rows[o : o + 500])
        if o >= 1000:
            b.erase_batch(keys[o - 1000 : o - 900])
    out, found = b.lookup_batch(keys)
    expect = np.ones(5000, bool)
    for o in range(1000, 5000, 500):
        expect[o - 1000 : o - 900] = False
    np.testing.assert_array_equal(found, expect)
    np.testing.assert_array_equal(out[expect], rows[expect])


def test_disk_persistence(tmp_path, rng):
    path = str(tmp_path / "p.log")
    keys = np.arange(100, dtype=np.int64) * 31
    rows = rng.normal(size=(100, WIDTH)).astype(np.float32)
    b = make_backend("disk", width=WIDTH, path=path)
    b.insert_batch(keys, rows)
    b.erase_batch(keys[:10])
    b.close()

    b2 = make_backend("disk", width=WIDTH, path=path)  # reopen from log replay
    assert len(b2) == 90
    out, found = b2.lookup_batch(keys)
    np.testing.assert_array_equal(found, np.arange(100) >= 10)
    np.testing.assert_array_equal(out[10:], rows[10:])
    b2.compact()
    out2, found2 = b2.lookup_batch(keys)
    np.testing.assert_array_equal(found2, found)
    np.testing.assert_array_equal(out2[10:], rows[10:])
    b2.close()


def test_host_concurrent_reads_during_writes(rng):
    """The C6 race guard (SURVEY.md §5): concurrent batch readers/writers on
    the shared store never crash or return torn rows (rows are written whole
    under the writer lock; readers hold the shared lock)."""
    import threading

    b = make_backend("host", width=8)
    keys = np.arange(2000, dtype=np.int64)
    marker = np.tile(np.arange(2000, dtype=np.float32)[:, None], (1, 8))
    b.insert_batch(keys, marker)
    errors = []

    def reader():
        try:
            for _ in range(30):
                out, found = b.lookup_batch(keys)
                rows = out[found]
                # each found row must be internally consistent (not torn)
                assert (rows == rows[:, :1]).all()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def writer():
        try:
            for i in range(30):
                b.insert_batch(keys, marker + i)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=f) for f in (reader, reader, writer, writer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_host_kv_asan_build():
    """SURVEY.md §5 sanitizer config: the C++ tier builds and passes an
    insert/lookup/erase stress under AddressSanitizer+UBSan (subprocess with
    the ASan runtime preloaded; leak check off — CPython itself 'leaks')."""
    import os
    import subprocess
    import sys

    asan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    if not asan or not os.path.exists(asan):
        import pytest

        pytest.skip("libasan not available")
    code = """
import numpy as np
from meepoembedding_tpu.backends.host_kv import HostKVStore
s = HostKVStore(width=8)
k = np.arange(1, 1001, dtype=np.int64)
r = np.random.default_rng(0).normal(size=(1000, 8)).astype(np.float32)
s.insert_batch(k, r)
out, f = s.lookup_batch(k)
assert f.all() and np.allclose(out, r)
s.erase_batch(k[:500])
_, f = s.lookup_batch(k)
assert f[500:].all() and not f[:500].any()
print("ASAN-OK")
"""
    env = dict(
        os.environ, MEEPO_SANITIZE="1", LD_PRELOAD=asan,
        ASAN_OPTIONS="detect_leaks=0",
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0 and "ASAN-OK" in out.stdout, out.stderr[-2000:]
