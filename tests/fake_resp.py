"""Minimal in-process RESP2 server (MSET/MGET/DEL/SCAN/PING) so the remote-KV
backend (SURVEY.md C7) is testable without a redis installation."""

from __future__ import annotations

import socket
import threading


class FakeRespServer:
    def __init__(self):
        self._data = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def close(self):
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn):
        buf = b""

        def read_line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            line, buf = buf.split(b"\r\n", 1)
            return line

        def read_exact(n):
            nonlocal buf
            while len(buf) < n + 2:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            data, buf = buf[:n], buf[n + 2 :]
            return data

        try:
            while True:
                line = read_line()
                assert line[:1] == b"*", line
                argc = int(line[1:])
                args = []
                for _ in range(argc):
                    ln = read_line()
                    assert ln[:1] == b"$"
                    args.append(read_exact(int(ln[1:])))
                conn.sendall(self._dispatch(args))
        except (ConnectionError, OSError, AssertionError):
            conn.close()

    def _dispatch(self, args) -> bytes:
        cmd = args[0].upper()
        with self._lock:
            if cmd == b"PING":
                return b"+PONG\r\n"
            if cmd == b"MSET":
                for i in range(1, len(args), 2):
                    self._data[args[i]] = args[i + 1]
                return b"+OK\r\n"
            if cmd == b"MGET":
                out = [b"*%d\r\n" % (len(args) - 1)]
                for k in args[1:]:
                    v = self._data.get(k)
                    out.append(b"$-1\r\n" if v is None else b"$%d\r\n%s\r\n" % (len(v), v))
                return b"".join(out)
            if cmd == b"DEL":
                n = sum(1 for k in args[1:] if self._data.pop(k, None) is not None)
                return b":%d\r\n" % n
            if cmd == b"SCAN":
                # single-pass cursor: return everything matching, cursor 0
                pat = b""
                for i, a in enumerate(args):
                    if a.upper() == b"MATCH":
                        pat = args[i + 1].rstrip(b"*")
                names = [k for k in self._data if k.startswith(pat)]
                out = [b"*2\r\n$1\r\n0\r\n", b"*%d\r\n" % len(names)]
                for k in names:
                    out.append(b"$%d\r\n%s\r\n" % (len(k), k))
                return b"".join(out)
        return b"-ERR unknown command\r\n"
