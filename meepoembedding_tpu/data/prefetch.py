"""Background batch prefetch (SURVEY.md C17): a daemon thread runs the
upstream stream's generator and keeps a small bounded queue of ready batches,
so host-side parsing/generation overlaps device compute. ctypes-based native
parsing (criteo_native) releases the GIL, so the overlap is real parallelism
for the Criteo path, not just interleaving.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class PrefetchStream:
    """Wraps any object with .batches(steps) -> iterator of batch dicts."""

    _END = object()

    def __init__(self, inner, depth: int = 2):
        self.inner = inner
        self.depth = depth

    def __getattr__(self, name):
        # transparent wrapper: expose the inner stream's attributes
        # (host_id, paths, ...) to existing consumers
        return getattr(self.inner, name)

    def batches(self, steps: Optional[int] = None) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that aborts when the consumer abandoned the
            # generator — otherwise the worker blocks forever on a full
            # queue, leaking the thread and the upstream file handle
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            try:
                for b in self.inner.batches(steps):
                    if not put(b):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                put(self._END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is self._END:
                    if err:
                        raise err[0]
                    return
                yield b
        finally:
            stop.set()  # runs on GeneratorExit / consumer exception too
