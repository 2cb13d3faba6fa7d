"""Incremental pack + shard-scoped compact: O(batch)/O(touched) on disk.

The claims under test (VERDICT r2 items 4-5):
- an append finalize re-packs only the ordinal groups (og partitions) the
  batch touched — older og partition files are byte-identical afterwards;
- a finalize with nothing new leaves the packed table entirely alone;
- WAND over an incrementally packed table (avgdl drifted since the bounds
  were computed) stays bit-identical to the flat exhaustive path;
- compact() rewrites only files holding touched-shard rows — after a
  merge() (shard-clustered files), untouched shards' docs/postings files
  are byte-identical.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

from nixiesearch_spark.corpus import make_corpus
from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader
from nixiesearch_spark.query import MatchQuery, Searcher
from nixiesearch_spark.streaming import IncrementalIndexer


def _file_hashes(root: str, pat: str = "**/*.parquet") -> dict[str, str]:
    out = {}
    for f in glob.glob(os.path.join(root, pat), recursive=True):
        with open(f, "rb") as fh:
            out[os.path.relpath(f, root)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def _flat_vs_wand(spark, idx, text, k=10):
    from nixiesearch_spark.query.wand import wand_topk

    r = IndexReader(spark, idx)
    s = Searcher(r)
    flat = [(x["docid"], x["score"]) for x in s.search(MatchQuery("content", text), size=k).collect()]
    wand = [(x["docid"], x["score"]) for x in wand_topk(r, "content", text, k=k).collect()]
    assert flat == wand, (text, flat, wand)
    return flat


def test_incremental_pack_og_scoped(spark, tmp_path):
    # tiny group span (block_size × 1 = 128 ordinals) so a 600-doc corpus
    # spans several og groups per shard
    cfg = IndexConfig(
        text_fields=("content",), id_col="doc_id", n_shards=2,
        extra={"pack_group_blocks": 1},
    )
    idx = str(tmp_path / "idx")
    full = make_corpus(700)
    full.insert(0, "doc_id", range(700))
    base, extra = full.iloc[:600], full.iloc[600:]
    b = IndexBuilder(spark, cfg)
    b.build(spark.createDataFrame(base), idx)

    packed = os.path.join(idx, "packed")
    ogs = sorted(glob.glob(os.path.join(packed, "og=*")))
    assert len(ogs) >= 2, ogs
    before = _file_hashes(packed)
    with open(os.path.join(idx, "packed_manifest.json")) as f:
        man0 = json.load(f)

    # ---- noop finalize: nothing new → zero packed churn
    b.finalize(idx)
    assert _file_hashes(packed) == before

    # ---- append a small batch through the streaming sink
    inc = IncrementalIndexer(spark, cfg, idx, pack_each_batch=True)
    inc.process_batch(spark.createDataFrame(extra), batch_id=7)
    after = _file_hashes(packed)
    changed = {f for f in before if after.get(f) != before[f]}
    missing = {f for f in before if f not in after}
    # the re-pack touched ONLY the tail og partitions: strictly fewer og
    # dirs than exist, and every earlier og file is byte-identical
    touched_ogs = {f.split(os.sep)[0] for f in (changed | missing)}
    all_ogs = {os.path.basename(d) for d in glob.glob(os.path.join(packed, "og=*"))}
    assert touched_ogs and touched_ogs < all_ogs, (touched_ogs, all_ogs)
    with open(os.path.join(idx, "packed_manifest.json")) as f:
        man1 = json.load(f)
    assert set(man0["files"]) < set(man1["files"])
    assert man1["pack_avgdl"] == man0["pack_avgdl"]  # bounds' avgdl pinned

    # ---- WAND accepts (packed_seqnum fresh) and stays bit-identical to the
    # flat path even though avgdl drifted from pack_avgdl
    r = IndexReader(spark, idx)
    assert r.stats["packed_seqnum"] == r.stats["seqnum"]
    assert r.stats["pack_avgdl"]["content"] == man0["pack_avgdl"]["content"]
    for q in ("def import return", "the", "spark0 if"):
        _flat_vs_wand(spark, idx, q)


def test_compact_rewrites_only_touched_shards(spark, tmp_path):
    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=4)
    idx = str(tmp_path / "idx")
    corpus = make_corpus(400)
    corpus.insert(0, "doc_id", range(400))
    b = IndexBuilder(spark, cfg)
    b.build(spark.createDataFrame(corpus), idx)
    b.merge(idx)  # shard-clusters docs/postings files → compact can scope

    docs_before = _file_hashes(os.path.join(idx, "docs"))
    post_before = _file_hashes(os.path.join(idx, "postings"))

    # tombstone two docids from ONE shard (shard = docid % 4)
    victims = [d for d in corpus["doc_id"].tolist() if d % 4 == 1][:2]
    inc = IncrementalIndexer(spark, cfg, idx)
    inc.delete_ids(victims)
    inc.compact()

    docs_after = _file_hashes(os.path.join(idx, "docs"))
    post_after = _file_hashes(os.path.join(idx, "postings"))
    # untouched files (no shard-1 rows) must be byte-identical — merge()
    # wrote shard-clustered files, so most qualify
    kept_docs = {f for f in docs_before if docs_after.get(f) == docs_before[f]}
    kept_post = {f for f in post_before if post_after.get(f) == post_before[f]}
    assert kept_docs, docs_after.keys()
    assert kept_post, post_after.keys()

    # deleted docs are gone physically; index still consistent end-to-end
    s = Searcher(IndexReader(spark, idx))
    import pyspark.sql.functions as F

    alive = s.reader.docs.where(F.col("docid").isin([int(v) for v in victims])).count()
    assert alive == 0
    assert s.reader.tombstones is None
    _flat_vs_wand(spark, idx, "def import return")

    # appends after a scoped compact must not collide with surviving
    # ordinals (NULL rows_in lineage rows force the max-ordinal fallback)
    extra = make_corpus(440).iloc[400:]
    extra.insert(0, "doc_id", range(400, 440))
    inc.process_batch(spark.createDataFrame(extra), batch_id=3)
    r = IndexReader(spark, idx)
    dup = (
        r.docs.groupBy("shard", "ordinal")
        .count()
        .where("count > 1")
        .count()
    )
    assert dup == 0
    _flat_vs_wand(spark, idx, "def import return")


def test_full_build_lineage_metrics_match_posthoc_count(spark, tmp_path):
    """Full builds derive postings_out by counting the cached aggregation
    after the write (no exploded-stream observe); the recorded metric must
    equal the actual per-(shard, field) postings row count."""
    from pyspark.sql import functions as F

    from nixiesearch_spark.index import IndexBuilder, IndexConfig

    rows = [(i, f"alpha beta{i % 5} gamma{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path / "idx")
    cfg = IndexConfig(text_fields=("content",), id_col="doc_id", n_shards=4, quantize=True)
    IndexBuilder(spark, cfg).build(df, d, resume=False)
    lin = {
        (r["shard"], r["field"]): r["postings_out"]
        for r in spark.read.parquet(d + "/lineage").collect()
    }
    actual = {
        (r["shard"], "content"): r["cnt"]
        for r in spark.read.parquet(d + "/postings")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert lin == actual, (lin, actual)
