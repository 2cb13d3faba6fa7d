"""Index-build invariants: skew distribution, merge compaction, idempotence."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from nixiesearch_spark.corpus import make_corpus
from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader
from nixiesearch_spark.query import MatchQuery, Searcher


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, tiny_corpus_pd):
    d = str(tmp_path_factory.mktemp("idxb"))
    df = spark.createDataFrame(tiny_corpus_pd)
    cfg = IndexConfig(text_fields=("content",), n_shards=8)
    IndexBuilder(spark, cfg).build(df, d)
    return d, cfg


def test_high_df_terms_spread_across_shards(spark, built):
    """North-rule skew handling: a high-DF term's postings must be split
    across ALL shards (document sharding), never concentrated on one
    reducer. 'def' appears in ~every doc of the Zipf corpus."""
    d, cfg = built
    postings = spark.read.parquet(os.path.join(d, "postings"))
    per_shard = (
        postings.where(F.col("term") == "def").groupBy("shard").count().collect()
    )
    counts = {r["shard"]: r["count"] for r in per_shard}
    assert len(counts) == cfg.n_shards, "high-DF term must appear in every shard"
    mx, mn = max(counts.values()), min(counts.values())
    assert mx <= 3 * max(mn, 1), f"shard skew too high: {counts}"


def test_merge_compacts_files_and_preserves_results(spark, tmp_path):
    cfg = IndexConfig(text_fields=("content",), n_shards=4)
    d = str(tmp_path / "idx")
    pdf = make_corpus(120, seed=3)
    df = spark.createDataFrame(pdf)
    b = IndexBuilder(spark, cfg)
    # six appends (simulating incremental batches) → many small files
    os.makedirs(d)
    for lo in range(0, 120, 20):
        b._build_shards(spark.createDataFrame(pdf.iloc[lo:lo + 20]), d, list(range(4)))
    b.finalize(d)
    before = len(glob.glob(os.path.join(d, "postings", "**", "*.parquet"), recursive=True))
    s = Searcher(IndexReader(spark, d))
    q = MatchQuery("content", "def import")
    res_before = [(r["docid"], r["score"]) for r in s.search(q, size=20).collect()]
    b.merge(d)
    after = len(glob.glob(os.path.join(d, "postings", "**", "*.parquet"), recursive=True))
    assert after < before, f"merge must reduce file count ({before} -> {after})"
    s2 = Searcher(IndexReader(spark, d))
    res_after = [(r["docid"], r["score"]) for r in s2.search(q, size=20).collect()]
    assert res_before == res_after


def test_duplicate_docids_in_batch_keep_per_row_ordinals(spark, tmp_path):
    # r6 code review: the broadcast-ordinal join keyed on docid would fan
    # k duplicate rows out to k*k payload rows and double tf. Duplicate
    # docids within a batch are legitimate (re-ingest before compaction),
    # so the build must detect them and take the window path: one docs row
    # and one set of postings PER INPUT ROW, tf counted per row.
    import pandas as pd

    d = str(tmp_path / "dupidx")
    pdf = pd.DataFrame(
        {
            "repo": ["r", "r", "r"],
            "path": ["p", "p", "q"],   # rows 0,1 share (repo,path,commit)
            "commit": ["c", "c", "c"],
            "lang": ["py", "py", "py"],
            "content": ["hello world", "hello world", "other text"],
        }
    )
    cfg = IndexConfig(text_fields=("content",), n_shards=4)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), d, resume=False)
    docs = spark.read.parquet(d + "/docs")
    assert docs.count() == 3, "k duplicate rows must stay k rows, not k*k"
    post = spark.read.parquet(d + "/postings").toPandas()
    hello = post[post["term"] == "hello"]
    assert sorted(hello["tf"]) == [1, 1], "tf must count per row, not per docid"
    # the two duplicate rows carry distinct ordinals (append-safe)
    dup = docs.where("path = 'p'").toPandas()
    assert len(set(dup["ordinal"])) == 2
