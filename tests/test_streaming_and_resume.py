"""Incremental (Structured Streaming) index maintenance + checkpoint/resume.

Resume fixture per FIXTURES.md §4: kill the build after a strict subset of
shards commit lineage; the re-run must skip committed shards and produce a
final postings table byte-identical to an uninterrupted build.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nixiesearch_spark.corpus import make_corpus
from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader
from nixiesearch_spark.query import MatchQuery, Searcher
from nixiesearch_spark.streaming import IncrementalIndexer


def postings_signature(spark, index_dir: str) -> list:
    """Canonical content signature of the postings table (order-free)."""
    df = spark.read.parquet(os.path.join(index_dir, "postings"))
    return (
        df.select(
            F.sha2(
                F.concat_ws("|", "shard", "field", "term", "docid", "norm", "tf"), 256
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("sig"),
             F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )


def test_resume_produces_identical_index(spark, tmp_path):
    pdf = make_corpus(200, seed=7)
    df = spark.createDataFrame(pdf)
    cfg = IndexConfig(text_fields=("content",), n_shards=6)

    # uninterrupted reference build
    full_dir = str(tmp_path / "full")
    IndexBuilder(spark, cfg).build(df, full_dir)
    ref_sig = postings_signature(spark, full_dir)

    # interrupted build: only shards {0,1} commit, then the "process dies"
    part_dir = str(tmp_path / "partial")
    b = IndexBuilder(spark, cfg)
    os.makedirs(part_dir)
    b._build_shards(df, part_dir, [0, 1])
    committed = b._committed_shards(part_dir)
    assert committed == {0, 1}

    # re-run: must skip committed shards and finish the rest
    b2 = IndexBuilder(spark, cfg)
    stats = b2.build(df, part_dir, resume=True)
    assert b2._committed_shards(part_dir) == set(range(6))
    got_sig = postings_signature(spark, part_dir)
    assert got_sig == ref_sig, "resumed build must be content-identical"

    # and search results identical too
    s_full = Searcher(IndexReader(spark, full_dir))
    s_part = Searcher(IndexReader(spark, part_dir))
    q = MatchQuery("content", "def import return")
    a = [(r["docid"], r["score"]) for r in s_full.search(q, size=20).collect()]
    c = [(r["docid"], r["score"]) for r in s_part.search(q, size=20).collect()]
    assert a == c


def test_append_ordinals_safe_above_64_shards(spark, tmp_path):
    """n_shards > 64 → lineage rows carry rows_in=NULL (totals-only
    Observation); a second append batch must still continue each shard's
    ordinals from the committed max, never restart at 0 (regression:
    _shard_bases summed NULLs to 0 and packed/WAND mapped to wrong docids).
    """
    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=70)
    idx = str(tmp_path / "idx70")
    os.makedirs(idx)
    b = IndexBuilder(spark, cfg)
    d1 = spark.createDataFrame(
        [(i, f"alpha doc number{i}") for i in range(1, 201)], "doc_id long, content string"
    )
    b._build_shards(d1, idx, list(range(70)))
    # lineage really is in totals-only mode for this config
    lin = spark.read.parquet(os.path.join(idx, "lineage"))
    assert lin.where((F.col("status") == "committed") & F.col("rows_in").isNotNull()).count() == 0
    d2 = spark.createDataFrame(
        [(i, f"beta doc number{i}") for i in range(201, 401)], "doc_id long, content string"
    )
    b._build_shards(d2, idx, list(range(70)))
    b.finalize(idx)
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    n = docs.count()
    assert n == 400
    # (shard, ordinal) must be unique — the invariant the packed path needs
    assert docs.select("shard", "ordinal").distinct().count() == n
    # and the quantized WAND path must resolve correct docids end-to-end
    from nixiesearch_spark.query.wand import wand_topk

    r = IndexReader(spark, idx)
    got = {row["docid"] for row in wand_topk(r, "content", "beta", 400).collect()}
    assert got == set(range(201, 401))


def test_incremental_stream_and_compact(spark, tmp_path):
    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=4)
    idx_dir = str(tmp_path / "idx")
    in_dir = str(tmp_path / "in")
    cp_dir = str(tmp_path / "cp")
    os.makedirs(in_dir)

    batch1 = spark.createDataFrame(
        [(1, "red dress"), (2, "white dress"), (3, "red pajama")],
        "doc_id long, content string",
    )
    batch1.write.parquet(os.path.join(in_dir, "b1"))

    inc = IncrementalIndexer(spark, cfg, idx_dir)
    schema = "doc_id long, content string"
    q = inc.start_file_stream(in_dir, schema, cp_dir)
    q.awaitTermination(120)

    s = Searcher(IndexReader(spark, idx_dir))
    assert [r["docid"] for r in s.search(MatchQuery("content", "pajama")).collect()] == [3]

    # second drop: new doc 4 + updated doc 3 (pajama -> jacket)
    batch2 = spark.createDataFrame(
        [(4, "green jacket"), (3, "red jacket")], "doc_id long, content string"
    )
    batch2.write.parquet(os.path.join(in_dir, "b2"))
    q2 = inc.start_file_stream(in_dir, schema, cp_dir)
    q2.awaitTermination(120)

    s = Searcher(IndexReader(spark, idx_dir))
    hits = {r["docid"] for r in s.search(MatchQuery("content", "jacket"), size=10).collect()}
    assert hits == {3, 4}  # new content searchable immediately
    # pre-compaction at-least-once window: old version of doc 3 still matches
    assert {r["docid"] for r in s.search(MatchQuery("content", "pajama")).collect()} == {3}

    inc.compact()
    s = Searcher(IndexReader(spark, idx_dir))
    assert s.search(MatchQuery("content", "pajama")).collect() == []  # old version gone
    assert {
        r["docid"] for r in s.search(MatchQuery("content", "jacket"), size=10).collect()
    } == {3, 4}
    docs = spark.read.parquet(os.path.join(idx_dir, "docs"))
    assert docs.count() == 4  # upsert-by-id collapsed doc 3


def test_tiered_auto_compaction(spark, tmp_path):
    """Repeated small append batches must auto-merge when the postings file
    count crosses the tiered policy threshold, keeping the file count bounded
    and the query results unchanged (reference MergePolicyConfig.scala)."""
    from nixiesearch_spark.streaming import MergePolicy

    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=2)
    idx = str(tmp_path / "idx")
    inc = IncrementalIndexer(
        spark, cfg, idx, merge_policy=MergePolicy(kind="tiered", segments_per_tier=2, min_files=4)
    )
    for b in range(6):
        df = spark.createDataFrame(
            [(b * 10 + i, f"batch{b} common doc number{b * 10 + i}") for i in range(5)],
            "doc_id long, content string",
        )
        inc.process_batch(df, b)
    # policy bound: files never accumulate past one merge-cycle worth
    assert inc._postings_file_count() <= max(4, 2 * cfg.n_shards) + 2
    s = Searcher(IndexReader(spark, idx))
    got = {r["docid"] for r in s.search(MatchQuery("content", "common"), size=50).collect()}
    assert got == {b * 10 + i for b in range(6) for i in range(5)}
    assert {r["docid"] for r in s.search(MatchQuery("content", "batch3"), size=50).collect()} == {
        30, 31, 32, 33, 34
    }


def test_deferred_pack_streaming_mode(spark, tmp_path):
    """pack_each_batch=False: the flat path serves every batch immediately,
    WAND refuses the stale packed table, and the next merge re-packs."""
    import numpy as np

    from nixiesearch_spark.query.wand import wand_topk

    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=2)
    idx = str(tmp_path / "idx")
    inc = IncrementalIndexer(spark, cfg, idx, pack_each_batch=False)
    inc.process_batch(
        spark.createDataFrame([(1, "red dress"), (2, "white dress")],
                              "doc_id long, content string"), 0)
    inc.process_batch(
        spark.createDataFrame([(3, "red pajama")], "doc_id long, content string"), 1)
    s = Searcher(IndexReader(spark, idx))
    assert {r["docid"] for r in s.search(MatchQuery("content", "red"), size=5).collect()} == {1, 3}
    with pytest.raises(ValueError, match="stale"):
        wand_topk(s.reader, "content", "red", 5)
    inc.builder.merge(idx)  # compaction re-packs
    r2 = IndexReader(spark, idx)
    flat = [(r["docid"], np.float32(r["score"]))
            for r in Searcher(r2).search(MatchQuery("content", "red"), size=5).collect()]
    wand = [(r["docid"], np.float32(r["score"]))
            for r in wand_topk(r2, "content", "red", 5).collect()]
    assert flat == wand and {d for d, _ in wand} == {1, 3}


def test_delete_by_id(spark, tmp_path):
    from nixiesearch_spark.query.wand import wand_topk

    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=2)
    idx = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(1, "red dress"), (2, "white dress"), (3, "red pajama")], "doc_id long, content string"
    )
    inc = IncrementalIndexer(spark, cfg, idx)
    b = IndexBuilder(spark, cfg)
    b.build(df, idx)
    s = Searcher(IndexReader(spark, idx))
    assert {r["docid"] for r in s.search(MatchQuery("content", "red"), size=5).collect()} == {1, 3}
    inc.delete_ids([3])
    s = Searcher(IndexReader(spark, idx))
    # immediate logical delete on the flat path
    assert {r["docid"] for r in s.search(MatchQuery("content", "red"), size=5).collect()} == {1}
    # tombstones ride INSIDE the pruned WAND search (banned-ordinal mask) —
    # correct immediately, no compaction needed
    assert [r["docid"] for r in wand_topk(s.reader, "content", "red", 5).collect()] == [1]
    inc.compact()
    s = Searcher(IndexReader(spark, idx))
    assert {r["docid"] for r in s.search(MatchQuery("content", "red"), size=5).collect()} == {1}
    assert s.reader.tombstones is None
    assert [r["docid"] for r in wand_topk(s.reader, "content", "red", 5).collect()] == [1]
