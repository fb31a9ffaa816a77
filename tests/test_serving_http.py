"""HTTP serving layer (serving_http.RetrievalServer)."""
import json
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

from lightningdot_tpu.serving_frontend import BatchingFrontend
from lightningdot_tpu.serving_http import RetrievalServer

from test_serving_frontend import retriever  # noqa: F401 (fixture)


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def server(retriever):  # noqa: F811
    fe = BatchingFrontend(retriever, max_batch=8, max_wait_ms=5.0)
    with RetrievalServer(fe, port=0) as srv:
        yield srv


def test_search_and_health(server):
    status, body = _get(f"{server.address}/healthz")
    assert status == 200 and body["ok"] and body["corpus"] == 200

    status, body = _get(f"{server.address}/search?q=a+dog&top=5")
    assert status == 200
    assert body["query"] == "a dog"
    assert len(body["results"]) == 5
    scores = [s for _, s in body["results"]]
    assert scores == sorted(scores, reverse=True)
    # parity with the direct retriever
    want = server.frontend.retriever.retrieve_query("a dog", top=5)
    assert [i for i, _ in want] == [i for i, _ in body["results"]]


def test_concurrent_http_requests_coalesce(server):
    urls = [f"{server.address}/search?q=dog+{i}&top=3" for i in range(16)]
    with ThreadPoolExecutor(16) as pool:
        out = list(pool.map(_get, urls))
    assert all(status == 200 and len(body["results"]) == 3
               for status, body in out)
    fe = server.frontend
    assert fe.requests_served >= 16
    assert fe.batches_dispatched < fe.requests_served  # coalescing happened


def test_error_codes(server):
    # top outside [1, max_top] must 400 BEFORE reaching the device: a
    # client-controlled k would otherwise compile (and cache) one program
    # per value, or crash the coalesced batch on top<0
    for path, code in [("/nope", 404), ("/search", 400),
                       ("/search?q=x&top=abc", 400),
                       ("/search?q=x&top=0", 400),
                       ("/search?q=x&top=-1", 400),
                       ("/search?q=x&top=101", 400)]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{server.address}{path}")
        assert ei.value.code == code


def test_submit_rejects_bad_top(retriever):
    with BatchingFrontend(retriever, max_batch=4, max_wait_ms=1.0,
                          max_top=50) as fe:
        with pytest.raises(ValueError):
            fe.submit("q", top=0)
        with pytest.raises(ValueError):
            fe.submit("q", top=51)
        assert len(fe.retrieve("q", top=50)) == 50
