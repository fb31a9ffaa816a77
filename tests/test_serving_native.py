"""Native (C++) HTTP serving frontend: correctness vs the Python stack.

The native server (native/ldserve.cc via serving_native.py) must be
byte-level compatible with serving_http.py's JSON schema and batching
semantics; load behavior is characterized in scripts/perf_serving_native.py
(PERF.md "Native serving frontend").
"""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from lightningdot_tpu.serving_native import (NativeRetrievalServer,
                                             run_loadgen)

IDS = [f"img_{i:04d}.npz" for i in range(300)]


def fake_retrieve(queries, k):
    """Deterministic scores: row j of query q scores len(q) - j/2."""
    n = len(queries)
    idx = np.tile(np.arange(k, dtype=np.int32), (n, 1))
    scores = np.asarray([[len(q) - 0.5 * j for j in range(k)]
                         for q in queries], np.float32)
    return idx, scores


@pytest.fixture()
def server():
    srv = NativeRetrievalServer(IDS, fake_retrieve, max_batch=8,
                                max_wait_ms=1.0, max_top=10)
    yield srv
    srv.stop()


def _get(srv, path):
    return json.load(urllib.request.urlopen(srv.address + path, timeout=10))


def test_healthz_and_search_schema(server):
    assert _get(server, "/healthz") == {"ok": True, "corpus": 300}
    r = _get(server, "/search?q=a%20photo%20of%20a%20dog&top=3")
    assert r["query"] == "a photo of a dog"
    assert len(r["results"]) == 3
    # slicing to the request's top + id mapping + score formatting
    assert r["results"][0] == ["img_0000.npz", float(len(r["query"]))]
    assert r["results"][1][0] == "img_0001.npz"
    assert r["results"][1][1] == pytest.approx(len(r["query"]) - 0.5)


def test_unicode_and_json_escaping(server):
    q = 'café "quoted" \\slash'
    from urllib.parse import quote

    r = _get(server, f"/search?q={quote(q)}&top=1")
    assert r["query"] == q


def test_error_paths(server):
    for path, code in [("/search", 400), ("/nope", 404),
                       ("/search?q=x&top=999", 400),
                       ("/search?q=x&top=0", 400),
                       ("/search?q=x&top=abc", 400)]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(server.address + path, timeout=10)
        assert ei.value.code == code, path


def test_concurrent_requests_coalesce(server):
    results = [None] * 24

    def call(i):
        results[i] = _get(server, f"/search?q=q{i:02d}&top=5")

    threads = [threading.Thread(target=call, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        assert r["query"] == f"q{i:02d}"
        assert r["results"][0][1] == 3.0  # len("qNN")
    stats = server.stats()
    assert stats["batched_requests"] == 24
    # coalescing happened: fewer device calls than requests
    assert stats["batches"] < 24


def test_callback_exception_becomes_500():
    def boom(queries, k):
        raise RuntimeError("device on fire")

    with NativeRetrievalServer(IDS, boom, max_top=5) as srv:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(srv.address + "/search?q=x", timeout=10)
        assert ei.value.code == 500
        # server survives and keeps answering
        assert _get(srv, "/healthz")["ok"] is True


def test_pipelined_fifo_order_with_queued_errors():
    """HTTP/1.1 pipelining: responses on one connection must ship in
    request order even when an error reply (routed through the dispatcher
    queue because a /search is in flight) lands in the same dispatch group
    as a later /search."""
    import socket
    import time

    def slow_retrieve(queries, k):
        time.sleep(0.05)  # hold the batch so the pipelined tail queues up
        return fake_retrieve(queries, k)

    with NativeRetrievalServer(IDS, slow_retrieve, max_batch=8,
                               max_wait_ms=1.0, max_top=10) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        s.sendall(b"GET /search?q=first&top=1 HTTP/1.1\r\nHost: l\r\n\r\n"
                  b"GET /bogus HTTP/1.1\r\nHost: l\r\n\r\n"
                  b"GET /search?q=second&top=1 HTTP/1.1\r\nHost: l\r\n\r\n")
        buf = b""
        deadline = time.time() + 10
        while buf.count(b"\r\n\r\n") < 3 and time.time() < deadline:
            s.settimeout(max(0.1, deadline - time.time()))
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        s.close()
        statuses, bodies = [], []
        rest = buf
        for _ in range(3):
            head, _, rest = rest.partition(b"\r\n\r\n")
            assert head, f"missing response: {buf!r}"
            statuses.append(head.split(b"\r\n")[0].split(b" ", 1)[1])
            n = int([ln for ln in head.split(b"\r\n")
                     if ln.lower().startswith(b"content-length:")][0][15:])
            bodies.append(rest[:n])
            rest = rest[n:]
        assert statuses == [b"200 OK", b"404 Not Found", b"200 OK"], buf
        assert json.loads(bodies[0])["query"] == "first"
        assert json.loads(bodies[2])["query"] == "second"


def test_loadgen_closed_loop_smoke(server):
    stats = run_loadgen(server.port, rate=1500, duration_s=1.0, conns=4,
                        top=10)
    assert stats["errors"] == 0
    assert stats["completed"] >= 1000
    assert stats["p50_ms"] < 100


def test_matches_python_http_stack_schema(server):
    """The native response must parse identically to serving_http's for
    the same retriever contract (id mapping + top slicing)."""
    r = _get(server, "/search?q=hello&top=2")
    assert set(r) == {"query", "results"}
    assert all(isinstance(i, str) and isinstance(s, (int, float))
               for i, s in r["results"])
