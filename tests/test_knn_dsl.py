"""knn / rrf query-DSL tests (reference KnnQuery.scala:20-88,
RRFQuery.scala:23-79): vector top-k over stored embedding columns, hybrid
lexical ∥ vector RRF fusion, pre-filter semantics, nested (max-child) knn."""

from __future__ import annotations

import numpy as np
import pytest

from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader
from nixiesearch_spark.query import KnnQuery, MatchQuery, RRFQuery, Searcher, parse_query

DIM = 4


def _vec(i: int) -> list[float]:
    rng = np.random.default_rng(1000 + i)
    return [float(x) for x in rng.standard_normal(DIM)]


DOCS = [
    (i, f"doc {'red' if i % 2 else 'blue'} number {i}", _vec(i), [_vec(100 + i), _vec(200 + i)], i * 10)
    for i in range(1, 21)
]
QV = _vec(3)  # near doc 3's vector


@pytest.fixture(scope="module")
def s(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idxknn"))
    df = spark.createDataFrame(
        DOCS,
        "doc_id long, title string, emb array<float>, nested_emb array<array<float>>, price int",
    )
    cfg = IndexConfig(text_fields=("title",), id_col="doc_id", n_shards=2, quantize=False)
    IndexBuilder(spark, cfg).build(df, d)
    return Searcher(IndexReader(spark, d))


def _cos(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _expected_knn(k, pred=lambda i: True, nested=False):
    scored = []
    for i, _t, emb, nest, _p in DOCS:
        if not pred(i):
            continue
        # float32 storage: round-trip through float32 like the parquet column
        if nested:
            sim = max(_cos(np.asarray(v, dtype=np.float32), QV) for v in nest)
        else:
            sim = _cos(np.asarray(emb, dtype=np.float32), QV)
        scored.append((i, (1.0 + sim) / 2.0))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def test_knn_dsl_topk(s):
    out = s.search({"knn": {"field": "emb", "query_vector": QV, "k": 5}}, size=5).collect()
    exp = _expected_knn(5)
    assert [r["docid"] for r in out] == [i for i, _ in exp]
    for r, (_, es) in zip(out, exp):
        assert r["score"] == pytest.approx(es, abs=5e-7)


def test_knn_prefilter_returns_k_survivors(s):
    # pre-filter: the k results all satisfy the filter (a post-filter over
    # the unfiltered top-k would return fewer) — KnnFloatVectorQuery filter
    out = s.search(
        {"knn": {"field": "emb", "query_vector": QV, "k": 5}},
        filters={"range": {"price": {"gte": 100}}},
        size=5,
    ).collect()
    exp = _expected_knn(5, pred=lambda i: i * 10 >= 100)
    assert [r["docid"] for r in out] == [i for i, _ in exp]


def test_knn_nested_max_child(s):
    # DiversifyingChildren analog: parent score = max child cosine
    out = s.search({"knn": {"field": "nested_emb", "query_vector": QV, "k": 5}}, size=5).collect()
    exp = _expected_knn(5, nested=True)
    assert [r["docid"] for r in out] == [i for i, _ in exp]
    for r, (_, es) in zip(out, exp):
        assert r["score"] == pytest.approx(es, abs=5e-7)


def test_knn_num_candidates_default(s):
    q = parse_query({"knn": {"field": "emb", "query_vector": QV}})
    assert q.final_k == 15  # max(10, round(1.5*10))
    q = parse_query({"knn": {"field": "emb", "query_vector": QV, "k": 4, "num_candidates": 50}})
    assert q.final_k == 50
    with pytest.raises(ValueError, match="num_candidates"):
        parse_query({"knn": {"field": "emb", "query_vector": QV, "num_candidates": 20000}})


def test_hybrid_rrf_match_plus_knn(s):
    # hybrid fusion: lexical branch + vector branch under one rrf request
    size, window, k = 5, 10, 60.0
    out = s.search(
        {
            "rrf": {
                "retrieve": [
                    {"match": {"title": "red"}},
                    {"knn": {"field": "emb", "query_vector": QV, "k": 10}},
                ],
                "rank_window_size": window,
            }
        },
        size=size,
    ).collect()
    # oracle: rank each branch by (score desc, docid asc), fuse 1/(k+rank)
    match_scores = {
        r["docid"]: r["score"] for r in s.score(MatchQuery("title", "red")).collect()
    }
    b1 = sorted(match_scores, key=lambda d: (-match_scores[d], d))[:window]
    b2 = [i for i, _ in _expected_knn(15)][:window]  # final_k=15 candidates
    fused: dict = {}
    for b in (b1, b2):
        for rank, d in enumerate(b):
            fused[d] = fused.get(d, 0.0) + 1.0 / (k + rank)
    exp = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:size]
    assert [r["docid"] for r in out] == [d for d, _ in exp]
    for r, (_, es) in zip(out, exp):
        assert r["score"] == pytest.approx(es, rel=1e-12)


def test_rrf_single_branch_passthrough(s):
    # reference combine head::Nil: one branch → raw branch scores
    out = s.search({"rrf": {"retrieve": [{"match": {"title": "red"}}]}}, size=5).collect()
    direct = s.search(MatchQuery("title", "red"), size=5).collect()
    assert [(r["docid"], r["score"]) for r in out] == [
        (r["docid"], r["score"]) for r in direct
    ]


def test_rrf_rejects_sort(s):
    with pytest.raises(ValueError, match="sort"):
        s.search(
            {"rrf": {"retrieve": [{"match": {"title": "red"}}, {"match": {"title": "blue"}}]}},
            sort=[("price", "asc")],
            size=5,
        )


def test_rrf_fetch_fields(s):
    out = s.search(
        {
            "rrf": {
                "retrieve": [
                    {"match": {"title": "red"}},
                    {"knn": {"field": "emb", "query_vector": QV, "k": 10}},
                ]
            }
        },
        size=3,
        fields=["price"],
    ).collect()
    assert len(out) == 3
    assert all(r["price"] == r["docid"] * 10 for r in out)


def test_knn_requires_stored_vector_field(s):
    with pytest.raises(ValueError, match="not stored"):
        s.search({"knn": {"field": "nope", "query_vector": QV, "k": 3}})


def test_semantic_query_dsl(spark, tmp_path):
    """{"semantic": {field, query}} embeds the text with the pluggable
    embedder (deterministic hash default) and runs knn; a custom embedder
    plugs in via Searcher(embedder=...). Fusable under rrf."""
    from pyspark.sql import functions as F

    from nixiesearch_spark.embed import hash_embed_col, hash_embed_py
    from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader
    from nixiesearch_spark.query import Searcher

    df = spark.createDataFrame(
        [(1, "red dress party"), (2, "white dress"), (3, "red pajama nights")],
        "doc_id long, content string",
    )
    df = df.withColumn("content_emb", hash_embed_col(F.col("content")))
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=2)
    IndexBuilder(spark, cfg).build(df, idx)
    s = Searcher(IndexReader(spark, idx))
    got = s.search(
        {"semantic": {"field": "content_emb", "query": "red dress", "k": 3}}
    ).collect()
    assert [r["docid"] for r in got][:1] == [1]  # shares both tokens
    # equivalent explicit knn with the same embedded vector → same result
    qv = hash_embed_py("red dress")
    knn = s.search(
        {"knn": {"field": "content_emb", "query_vector": qv, "k": 3}}
    ).collect()
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in knn
    ]
    # custom embedder hook
    calls = []

    def my_embedder(text, model):
        calls.append((text, model))
        return hash_embed_py(text)

    s2 = Searcher(IndexReader(spark, idx), embedder=my_embedder)
    out2 = s2.search(
        {"semantic": {"field": "content_emb", "query": "red dress", "k": 3,
                      "model": "e5-small"}}
    ).collect()
    assert calls == [("red dress", "e5-small")]
    assert [r["docid"] for r in out2] == [r["docid"] for r in got]
    # hybrid: semantic ∥ lexical under rrf
    fused = s.search(
        {"rrf": {"retrieve": [
            {"match": {"content": "red"}},
            {"semantic": {"field": "content_emb", "query": "red dress"}},
        ]}},
        size=3,
    ).collect()
    assert fused and fused[0]["docid"] == 1


def test_knn_ann_route_prunes_partitions_and_matches_exact(s, spark, tmp_path):
    """attach_ann routes DSL knn through the IVF table: the scan must show
    directory-level PartitionFilters on bucket, and with n_probe = nlist
    (probe everything) results must equal the brute-force path exactly."""
    from nixiesearch_spark.pipeline import similarity

    rows = sorted((i, e) for i, _t, e, _n, _p in DOCS)
    mat = np.array([np.asarray(e, dtype=np.float32) for _, e in rows], dtype=np.float64)
    cents = similarity.kmeans_centroids(mat, k=4, iters=5, seed=7)
    d = str(tmp_path / "ivf")
    similarity.ivf_build(
        s.reader.docs.select("docid", "emb"), "docid", "emb", cents, d
    )
    s2 = Searcher(s.reader)
    q = {"knn": {"field": "emb", "query_vector": QV, "k": 5, "num_candidates": 5}}
    exact = s2.search(q, size=5).collect()
    # probe ALL buckets → candidate set == corpus → identical to exact scan
    s2.attach_ann("emb", d, cents, n_probe=len(cents))
    allp = s2.search(q, size=5).collect()
    assert [(r["docid"], r["score"]) for r in allp] == [
        (r["docid"], r["score"]) for r in exact
    ]
    # n_probe=1: results ⊆ the probed bucket's members, plan prunes dirs
    s3 = Searcher(s.reader)
    s3.attach_ann("emb", d, cents, n_probe=1)
    probes = similarity.ivf_probes(QV, cents, 1)
    df = s3.search(q, size=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    from pyspark.sql import functions as F

    members = {
        r["docid"]
        for r in spark.read.parquet(d).where(F.col("bucket").isin(probes)).collect()
    }
    got = {r["docid"] for r in df.collect()}
    assert got <= members and got


def test_knn_ann_prefilter_semantics(s, tmp_path):
    """Filters apply INSIDE the probed candidate set: every survivor
    satisfies the predicate (pre-filter, KnnQuery.scala:20-88)."""
    from nixiesearch_spark.pipeline import similarity

    rows = sorted((i, e) for i, _t, e, _n, _p in DOCS)
    mat = np.array([np.asarray(e, dtype=np.float32) for _, e in rows], dtype=np.float64)
    cents = similarity.kmeans_centroids(mat, k=2, iters=5, seed=7)
    d = str(tmp_path / "ivf2")
    similarity.ivf_build(s.reader.docs.select("docid", "emb"), "docid", "emb", cents, d)
    s2 = Searcher(s.reader)
    s2.attach_ann("emb", d, cents, n_probe=2)  # all buckets → pure filter test
    out = s2.search(
        {"knn": {"field": "emb", "query_vector": QV, "k": 4, "num_candidates": 4}},
        filters={"range": {"price": {"gte": 100}}},
        size=4,
    ).collect()
    assert len(out) == 4
    assert all(r["docid"] >= 10 for r in out)  # price = docid*10 >= 100
