"""HTTP API facade: route parity + the REST push source round trip.

The server is exercised over a real socket (ThreadingHTTPServer on an
ephemeral port, urllib client) — the reference's api/*Route tests drive
http4s the same way. Search results must equal the direct Searcher call;
pushed documents must become searchable after the POST returns
(commit-after-batch); deletes must vanish immediately (tombstones).
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from nixiesearch_spark.corpus import make_corpus
from nixiesearch_spark.index import IndexBuilder, IndexConfig
from nixiesearch_spark.query.suggest import build_suggest


def _req(port, method, path, body=None, ctype="application/json"):
    data = None
    if body is not None:
        data = body if isinstance(body, bytes) else json.dumps(body).encode()
    r = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method,
        headers={"Content-Type": ctype},
    )
    try:
        with urllib.request.urlopen(r) as resp:
            raw = resp.read()
            return resp.status, (
                json.loads(raw) if resp.headers.get_content_type() == "application/json" else raw.decode()
            )
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from nixiesearch_spark.api import SearchServer

    d = str(tmp_path_factory.mktemp("api_idx"))
    cfg = IndexConfig(text_fields=("content",), n_shards=4)
    df = spark.createDataFrame(make_corpus(300, seed=42))
    IndexBuilder(spark, cfg).build(df, d)
    build_suggest(spark, spark.read.parquet(f"{d}/docs"), "content", d, "content")
    srv = SearchServer(spark, port=0).add_index("docs", d, config=cfg).start()
    yield srv
    srv.stop()


def test_health_and_list(server):
    assert _req(server.port, "GET", "/health")[0] == 200
    st, body = _req(server.port, "GET", "/v1/index")
    assert st == 200 and body == {"indexes": ["docs"]}
    assert _req(server.port, "GET", "/_indexes")[1] == {"indexes": ["docs"]}


def test_mapping_and_stats(server):
    st, body = _req(server.port, "GET", "/v1/index/docs")
    assert st == 200 and "content" in body["fields"]
    st, legacy = _req(server.port, "GET", "/docs/_mapping")
    assert st == 200 and legacy == body
    st, stats = _req(server.port, "GET", "/v1/index/docs/stats")
    assert st == 200
    assert stats["fields"]["content"]["doc_count"] == 300
    assert stats["size_bytes"] > 0


def test_search_matches_direct(server, spark):
    from nixiesearch_spark.index import IndexReader
    from nixiesearch_spark.query import Searcher

    q = {"query": {"match": {"content": "def import return"}}, "size": 5}
    st, body = _req(server.port, "POST", "/v1/index/docs/search", q)
    assert st == 200 and len(body["hits"]) == 5
    direct = (
        Searcher(IndexReader(spark, server.indexes["docs"].index_dir))
        .search(q["query"], size=5)
        .collect()
    )
    assert [h["_id"] for h in body["hits"]] == [str(r["docid"]) for r in direct]
    assert [pytest.approx(h["_score"]) for h in body["hits"]] == [
        r["score"] for r in direct
    ]
    # legacy route serves the identical response shape
    st, legacy = _req(server.port, "POST", "/docs/_search", q)
    assert [h["_id"] for h in legacy["hits"]] == [h["_id"] for h in body["hits"]]


def test_search_with_fields_and_aggs(server):
    q = {
        "query": {"match": {"content": "def import"}},
        "size": 3,
        "fields": ["lang"],
        "aggs": {"by_lang": {"term": {"field": "lang", "size": 5}}},
    }
    st, body = _req(server.port, "POST", "/v1/index/docs/search", q)
    assert st == 200
    assert all("lang" in h for h in body["hits"])
    buckets = body["aggs"]["by_lang"]["buckets"]
    assert buckets and all({"term", "count"} <= set(b) for b in buckets)


def test_suggest(server):
    st, body = _req(server.port, "POST", "/v1/index/docs/suggest",
                    {"text": "im", "count": 5, "field": "content"})
    assert st == 200 and body["suggestions"]
    assert all(s["score"] > 0 for s in body["suggestions"])


def test_push_then_search_then_delete(server):
    # REST push source: NDJSON docs become searchable when the POST returns
    nd = b'\n'.join(
        json.dumps(
            {"repo": "api", "path": f"p{i}", "commit": "c", "lang": "py",
             "content": f"zzapipush{i} pushed document"}
        ).encode()
        for i in range(3)
    )
    st, body = _req(server.port, "POST", "/v1/index/docs", nd,
                    ctype="application/x-ndjson")
    assert st == 200 and body["status"] == "ok" and body["docs"] == 3
    st, res = _req(server.port, "POST", "/v1/index/docs/search",
                   {"query": {"match": {"content": "zzapipush1"}}, "size": 5})
    assert st == 200 and len(res["hits"]) == 1
    victim = int(res["hits"][0]["_id"])
    # DELETE /doc/{id}: gone from results immediately (tombstone anti-join)
    st, body = _req(server.port, "DELETE", f"/v1/index/docs/doc/{victim}")
    assert st == 200 and body["deleted"] == 1
    st, res = _req(server.port, "POST", "/v1/index/docs/search",
                   {"query": {"match": {"content": "zzapipush1"}}, "size": 5})
    assert st == 200 and res["hits"] == []
    # stats reflect the pushed batch (doc_count grew past the base corpus)
    st, stats = _req(server.port, "GET", "/v1/index/docs/stats")
    assert stats["fields"]["content"]["doc_count"] == 303


def test_metrics_and_errors(server):
    st, text = _req(server.port, "GET", "/metrics")
    assert st == 200 and "nixiesearch_index_docs" in text
    # every sample carries the index label (multi-index scrapes need it)
    assert 'index="docs"' in text
    assert _req(server.port, "GET", "/v1/index/nope/stats")[0] == 404
    assert _req(server.port, "POST", "/v1/index/docs/search",
                {"query": {"bogus_kind": {}}})[0] in (400, 500)
    st, _ = _req(server.port, "POST", "/v1/index/docs", b"", "application/json")
    assert st == 400
    # malformed client input is a 400, never a 500
    assert _req(server.port, "POST", "/v1/index/docs/search",
                b"not json at all")[0] == 400
    assert _req(server.port, "POST", "/v1/index/docs",
                b'{"broken json', "application/x-ndjson")[0] == 400
    assert _req(server.port, "DELETE", "/v1/index/docs/doc/notanint")[0] == 400


def test_push_batch_seqnums_continue_counter(server, spark):
    # docs-table seqnums are a batch COUNTER (not the epoch-ms manifest
    # seqnum): pushes onto a full build start at 1 and increment
    # mergeSchema: base-build files lack seqnum, pushed batches carry it
    docs = spark.read.option("mergeSchema", "true").parquet(
        server.indexes["docs"].index_dir + "/docs"
    )
    seqs = sorted(
        r["seqnum"]
        for r in docs.select("seqnum").distinct().collect()
        if r["seqnum"] is not None
    )
    assert seqs and seqs[0] >= 1 and seqs[-1] < 1_000_000, seqs


def test_writable_config_must_match_index(server, spark):
    from nixiesearch_spark.api import SearchServer, config_from_stats

    d = server.indexes["docs"].index_dir
    bad = IndexConfig(text_fields=("content",), n_shards=32)  # index has 4
    srv2 = SearchServer(spark, port=0).add_index("docs", d, config=bad).start()
    try:
        st, body = _req(srv2.port, "POST", "/v1/index/docs",
                        {"repo": "x", "path": "p", "commit": "c",
                         "lang": "py", "content": "nope"})
        assert st == 400 and "n_shards" in body["error"]
    finally:
        srv2.stop()
    # config_from_stats derives a compatible one
    good = config_from_stats(d)
    assert good.n_shards == 4 and "content" in good.text_fields
