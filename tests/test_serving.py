"""Serving-path behavior: the compiled-plan cache and the search-head
routes (auto WAND match, driver-mode RRF) — every fast path must return
results identical to the pure-Catalyst plan it replaces."""

from __future__ import annotations

import numpy as np
import pytest

from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader
from nixiesearch_spark.query import MatchQuery, Searcher
from nixiesearch_spark.query.wand import packed_ready, rrf_topk_driver


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, tiny_corpus_pd):
    d = str(tmp_path_factory.mktemp("idxsrv"))
    df = spark.createDataFrame(tiny_corpus_pd)
    cfg = IndexConfig(text_fields=("content",), n_shards=4, quantize=True, block_size=16)
    IndexBuilder(spark, cfg).build(df, d)
    return IndexReader(spark, d)


def _pairs(rows, r=None):
    if r is None:
        return [(x["docid"], np.float32(x["score"])) for x in rows]
    return [(x["docid"], round(float(x["score"]), r)) for x in rows]


RRF_Q2 = {
    "rrf": {
        "retrieve": [
            {"match": {"content": "def import return"}},
            {"match": {"content": "the for while"}},
        ],
        "rank_window_size": 30,
    }
}


def test_rrf_driver_equals_cluster_fused(built):
    s = Searcher(built, plan_cache=False)
    auto = s.search(RRF_Q2, size=10).collect()  # search-head kernel
    flat = s.search(RRF_Q2, size=10, mode="flat").collect()  # fused Catalyst
    # 2 branches → the float64 RRF sums are order-insensitive → exact equal
    assert _pairs(auto) == _pairs(flat)
    assert len(auto) == 10


def test_rrf_driver_three_branches_and_dead_branch(built):
    q = {
        "rrf": {
            "retrieve": [
                {"match": {"content": "def import"}},
                {"match": {"content": "the a"}},
                {"match": {"content": "zz_nosuchterm_zz"}},  # dead branch
            ],
            "rank_window_size": 25,
            "k": 42.0,
        }
    }
    s = Searcher(built, plan_cache=False)
    auto = s.search(q, size=8).collect()
    flat = s.search(q, size=8, mode="flat").collect()
    # ≥3 branches: float64 sum order may differ in the last ulp — compare
    # at 12 decimals (wider than any realistic rrf gap)
    assert _pairs(auto, 12) == _pairs(flat, 12)


def test_rrf_driver_all_dead(built):
    out = rrf_topk_driver(
        built, [("content", "zz_nope_a", "or"), ("content", "zz_nope_b", "or")]
    )
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["docid", "score"]


def test_rrf_driver_and_operator_branch(built):
    q = {
        "rrf": {
            "retrieve": [
                {"match": {"content": {"query": "def import", "operator": "and"}}},
                {"match": {"content": "return"}},
            ],
            "rank_window_size": 20,
        }
    }
    s = Searcher(built, plan_cache=False)
    assert _pairs(s.search(q, size=10).collect()) == _pairs(
        s.search(q, size=10, mode="flat").collect()
    )


def test_auto_match_routes_equal_flat(built):
    s = Searcher(built, plan_cache=False)
    for kwargs in (
        {},
        {"filters": {"range": {"commit": {"gte": "0"}}}},
        {"fields": ["lang"]},
    ):
        auto = s.search(MatchQuery("content", "def import return"), size=12, **kwargs)
        flat = s.search(
            MatchQuery("content", "def import return"), size=12, mode="flat", **kwargs
        )
        a, f = auto.collect(), flat.collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in f], kwargs


def test_plan_cache_hits_and_isolation(built):
    s = Searcher(built)
    q = MatchQuery("content", "def import")
    # flat plans cache: the same request returns the SAME DataFrame object
    # (whose QueryExecution compiles once)
    d1 = s.search(q, size=10, mode="flat")
    d2 = s.search(q, size=10, mode="flat")
    assert d1 is d2
    # different size → different plan
    assert s.search(q, size=11, mode="flat") is not d1
    # structural equality, not object identity, drives the key
    assert s.search(MatchQuery("content", "def import"), size=10, mode="flat") is d1
    # search-head (materialized) responses are never plan-cached
    a1 = s.search(q, size=10)
    a2 = s.search(q, size=10)
    assert a1 is not a2
    # cache off → no reuse
    s2 = Searcher(built, plan_cache=False)
    assert s2.search(q, size=10, mode="flat") is not s2.search(q, size=10, mode="flat")


def test_plan_cache_invalidates_on_tombstone(built, spark, tmp_path):
    import shutil
    import time

    d = str(tmp_path / "idxcopy")
    shutil.copytree(built.index_dir, d)
    r = IndexReader(spark, d)
    s = Searcher(r)
    q = MatchQuery("content", "def import return")
    before = s.search(q, size=5, mode="flat")
    top = before.collect()
    time.sleep(0.02)  # ensure a distinct tombstone-dir mtime
    dead = int(top[0]["docid"])
    spark.createDataFrame([(dead,)], "docid long").coalesce(1).write.mode(
        "append"
    ).parquet(d + "/tombstones")
    after = s.search(q, size=5, mode="flat")
    assert after is not before  # version token changed → fresh plan
    assert dead not in [x["docid"] for x in after.collect()]


def test_auto_falls_back_when_pack_stale(built, spark, tmp_path, tiny_corpus_pd):
    """Appending without re-packing makes packed stale; auto mode must fall
    back to the (fresh) flat path instead of raising or serving stale WAND."""
    import shutil

    d = str(tmp_path / "idxstale")
    shutil.copytree(built.index_dir, d)
    cfg = IndexConfig(text_fields=("content",), n_shards=4, quantize=True, block_size=16)
    b = IndexBuilder(spark, cfg)
    extra = spark.createDataFrame(
        [("zrepo", "zpath", "zc1", "def import zz_fresh_term")],
        "repo string, path string, commit string, content string",
    )
    b._build_shards(extra, d, list(range(4)))
    b.finalize(d, pack=False)
    r = IndexReader(spark, d)
    assert not packed_ready(r)
    s = Searcher(r)
    hits = s.search(MatchQuery("content", "zz_fresh_term"), size=5).collect()
    assert len(hits) == 1  # the fresh doc is visible → flat path served


def _flat_pairs(s, q, size=10):
    return _pairs(s.search(q, size=size, mode="flat").collect())


def test_bool_driver_equals_flat(built):
    from nixiesearch_spark.query import BoolQuery, MatchQuery

    s = Searcher(built, plan_cache=False)
    cases = [
        BoolQuery(must=[MatchQuery("content", "def import")],
                  should=[MatchQuery("content", "return")]),
        BoolQuery(must=[MatchQuery("content", "def"), MatchQuery("content", "the")]),
        BoolQuery(should=[MatchQuery("content", "def import")],
                  must_not=[MatchQuery("content", "return")]),
        BoolQuery(must=[MatchQuery("content", "def import", "and")],
                  should=[MatchQuery("content", "while for")]),
        BoolQuery(must=[MatchQuery("content", "def")],
                  must_not=[MatchQuery("content", "zz_nosuchterm")]),
        BoolQuery(must=[MatchQuery("content", "zz_nosuchterm")]),  # dead must
    ]
    for q in cases:
        auto = _pairs(s.search(q, size=12).collect())
        flat = _flat_pairs(s, q, 12)
        assert auto == flat, q


def test_dismax_driver_equals_flat(built):
    from nixiesearch_spark.query import DisMaxQuery, MatchQuery

    s = Searcher(built, plan_cache=False)
    for tie in (0.0, 0.3, 1.0):
        q = DisMaxQuery(
            queries=[MatchQuery("content", "def import"),
                     MatchQuery("content", "the return")],
            tie_breaker=tie,
        )
        auto = _pairs(s.search(q, size=12).collect())
        flat = _flat_pairs(s, q, 12)
        assert auto == flat, tie
    # tie > 1 breaks the Σ-bound → driver declines, flat serves (still equal)
    q = DisMaxQuery(
        queries=[MatchQuery("content", "def"), MatchQuery("content", "the")],
        tie_breaker=1.5,
    )
    assert _pairs(s.search(q, size=8).collect()) == _flat_pairs(s, q, 8)
