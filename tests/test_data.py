import numpy as np

from meepoembedding_tpu.data import criteo
from meepoembedding_tpu.data.synthetic import SyntheticConfig, SyntheticStream


def test_criteo_roundtrip(tmp_path):
    p = str(tmp_path / "sample.tsv")
    criteo.write_synthetic_criteo(p, 300, seed=1)
    stream = criteo.CriteoStream(p, batch_size=128)
    batches = list(stream.batches())
    assert len(batches) == 2  # 300 lines -> 2 full batches, partial dropped
    b = batches[0]
    assert b["dense"].shape == (128, 13) and b["ids"].shape == (128, 26)
    assert b["label"].shape == (128,)
    # ids namespaced per feature
    feat = (b["ids"] >> criteo.FEATURE_SHIFT).astype(np.int64)
    np.testing.assert_array_equal(feat, np.broadcast_to(np.arange(26), (128, 26)))
    assert np.isfinite(b["dense"]).all()
    assert (b["dense"] >= 0).all()  # log1p of clipped ints


def test_criteo_host_sharding(tmp_path):
    p = str(tmp_path / "sample.tsv")
    criteo.write_synthetic_criteo(p, 256, seed=2)
    b0 = list(criteo.CriteoStream(p, 64, host_id=0, num_hosts=2).batches())
    b1 = list(criteo.CriteoStream(p, 64, host_id=1, num_hosts=2).batches())
    assert len(b0) == 2 and len(b1) == 2
    # disjoint line assignment -> different batches
    assert not np.array_equal(b0[0]["ids"], b1[0]["ids"])


def test_criteo_parse_handles_missing_fields():
    lines = ["1\t\t\t5\t" + "\t".join([""] * 10) + "\t" + "\t".join(["0a1b2c3d"] * 26)]
    got = list(criteo.parse_lines(lines * 4, batch_size=4))
    assert got[0]["dense"][0, 0] == 0.0
    assert got[0]["label"][0] == 1.0


def test_synthetic_stream_stable():
    cfg = SyntheticConfig(num_dense=2, num_sparse=3, batch_size=16, seed=5)
    a = list(SyntheticStream(cfg).batches(2))
    b = list(SyntheticStream(cfg).batches(2))
    np.testing.assert_array_equal(a[1]["ids"], b[1]["ids"])
    assert set(np.unique(a[0]["ids"] >> 44)) == {0, 1, 2}


class TestNativeParser:
    def test_native_matches_python_bit_for_bit(self, tmp_path):
        """csrc/criteo_parse.cc must reproduce parse_lines exactly on a
        sample with empty fields, short lines, floats and odd tokens."""
        from meepoembedding_tpu.data import criteo, criteo_native

        assert criteo_native.available()
        p = tmp_path / "sample.tsv"
        criteo.write_synthetic_criteo(str(p), 300, seed=7)
        # adversarial extras: short line, float dense, weird token bytes
        with open(p, "a") as fh:
            fh.write("1\t3.5\t-2\n")
            fh.write("0\t" + "\t".join([""] * 13) + "\t" +
                     "\t".join(["deadbeef"] * 26) + "\textra\tfields\n")
            fh.write("\n")
        lines = open(p).readlines()
        py = list(criteo.parse_lines(iter(lines), 64))
        nat = list(criteo_native.parse_lines_native(iter(lines), 64))
        assert len(py) == len(nat) == len(lines) // 64
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a["label"], b["label"])
            np.testing.assert_array_equal(a["dense"], b["dense"])
            np.testing.assert_array_equal(a["ids"], b["ids"])

    def test_stream_uses_native(self, tmp_path):
        from meepoembedding_tpu.data import criteo

        p = tmp_path / "s.tsv"
        criteo.write_synthetic_criteo(str(p), 128, seed=1)
        got = list(criteo.CriteoStream([str(p)], batch_size=64).batches())
        assert len(got) == 2 and got[0]["ids"].shape == (64, 26)


class TestPrefetch:
    def test_prefetch_preserves_order_and_content(self, tmp_path):
        from meepoembedding_tpu.data import criteo
        from meepoembedding_tpu.data.prefetch import PrefetchStream

        p = tmp_path / "s.tsv"
        criteo.write_synthetic_criteo(str(p), 256, seed=4)
        plain = list(criteo.CriteoStream([str(p)], batch_size=64).batches())
        pre = list(PrefetchStream(
            criteo.CriteoStream([str(p)], batch_size=64), depth=2
        ).batches())
        assert len(plain) == len(pre) == 4
        for a, b in zip(plain, pre):
            np.testing.assert_array_equal(a["ids"], b["ids"])
            np.testing.assert_array_equal(a["dense"], b["dense"])

    def test_prefetch_propagates_errors(self):
        from meepoembedding_tpu.data.prefetch import PrefetchStream

        class Boom:
            def batches(self, steps=None):
                yield {"x": 1}
                raise RuntimeError("upstream died")

        it = PrefetchStream(Boom()).batches()
        assert next(it) == {"x": 1}
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="upstream died"):
            list(it)

    def test_prefetch_respects_steps(self, tmp_path):
        from meepoembedding_tpu.data import criteo
        from meepoembedding_tpu.data.prefetch import PrefetchStream

        p = tmp_path / "s.tsv"
        criteo.write_synthetic_criteo(str(p), 512, seed=5)
        s = PrefetchStream(criteo.CriteoStream([str(p)], batch_size=64, loop=True))
        assert sum(1 for _ in s.batches(3)) == 3


def test_criteo_parse_asan_fuzz():
    """Sanitizer gate for the native parser (SURVEY.md §5): ASan+UBSan build
    survives garbage byte buffers and adversarial field shapes (oversized
    fields, tab floods, no trailing newline, empty input)."""
    import os
    import subprocess
    import sys

    import pytest

    asan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    if not asan or not os.path.exists(asan):
        pytest.skip("libasan not available")
    so = "/tmp/_meepo_criteoparse_asan.so"
    subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-omit-frame-pointer", "-std=c++17", "-shared", "-fPIC",
         "csrc/criteo_parse.cc", "-o", so],
        check=True, capture_output=True, timeout=120, cwd="/root/repo",
    )
    code = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({so!r})
lib.criteo_parse_batch.restype = ctypes.c_long
lib.criteo_parse_batch.argtypes = [ctypes.c_char_p, ctypes.c_long,
    ctypes.c_long, ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_float)]
def run(buf, rows):
    dense = np.zeros((rows, 13), np.float32)
    ids = np.zeros((rows, 26), np.int64)
    lab = np.zeros(rows, np.float32)
    r = lib.criteo_parse_batch(buf, len(buf), rows,
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert 0 <= r <= rows, r
rng = np.random.default_rng(0)
for _ in range(200):
    run(bytes(rng.integers(0, 256, size=int(rng.integers(0, 2000)),
                           dtype=np.uint8)), int(rng.integers(1, 64)))
for buf in [b"1\\t" + b"x"*10000, b"\\t"*100, b"9"*500, b"", b"\\n"*50,
            b"1\\t2\\t3"]:
    run(buf, 4)
print("ASAN-OK")
"""
    env = dict(os.environ, LD_PRELOAD=asan, ASAN_OPTIONS="detect_leaks=0")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0 and "ASAN-OK" in out.stdout, out.stderr[-2000:]


def test_prefetch_abandoned_consumer_stops_worker(tmp_path):
    """Abandoning the prefetch generator mid-stream must unblock and stop
    the worker thread (no leaked thread holding the file handle)."""
    import threading
    import time

    from meepoembedding_tpu.data import criteo
    from meepoembedding_tpu.data.prefetch import PrefetchStream

    p = tmp_path / "s.tsv"
    criteo.write_synthetic_criteo(str(p), 2048, seed=6)
    before = threading.active_count()
    it = PrefetchStream(
        criteo.CriteoStream([str(p)], batch_size=64, loop=True), depth=1
    ).batches()
    next(it)
    it.close()  # abandon: GeneratorExit -> stop event
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before, "prefetch worker leaked"
