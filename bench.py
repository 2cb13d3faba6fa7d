"""Bench harness (driver contract): build + query benchmark at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) printing ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build": {...}, "scaling": {...}}

North-rule evidence (BASELINE.json): the same index build runs at two
parallelism levels (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors); scaling_efficiency = throughput_32 / (4 · throughput_8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = max(CPUS // 4, 1)
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"


def build_index(cores: int, out_dir: str, n_shards: int) -> dict:
    """One full index build at the given parallelism; returns metrics."""
    from nixiesearch_spark.index import IndexBuilder, IndexConfig
    from nixiesearch_spark.session import get_spark

    spark = get_spark(f"bench-build-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    try:
        df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        n_docs = df.count()
        cfg = IndexConfig(text_fields=("text",), id_col="doc_id", n_shards=n_shards)
        t0 = time.time()
        IndexBuilder(spark, cfg).build(df, out_dir, resume=False)
        wall = time.time() - t0
        return {"cores": cores, "docs": n_docs, "sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1)}
    finally:
        spark.stop()


def run_queries(index_dir: str) -> tuple[dict, list, object]:
    from pyspark.sql import functions as F

    from nixiesearch_spark.index import IndexReader
    from nixiesearch_spark.pipeline import similarity
    from nixiesearch_spark.query import (
        BoolQuery, DisMaxQuery, MatchQuery, Searcher,
    )
    from nixiesearch_spark.query.aggs import term_agg
    from nixiesearch_spark.query.rrf import rrf_fuse
    from nixiesearch_spark.query.wand import wand_topk
    from nixiesearch_spark.session import get_spark

    spark = get_spark("bench-query", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    reader = IndexReader(spark, index_dir).persist_hot()
    reader.packed.persist().count()
    reader.postings.count()  # warm the cache (reference keeps readers open)
    s = Searcher(reader)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qv = emb.limit(1).collect()[0]["embedding"]

    def flat(q, **kw):
        return lambda: s.search(q, **kw).collect()

    cases = {
        "match_or_flat": flat(MatchQuery("text", "spark join window group")),
        "match_and_flat": flat(MatchQuery("text", "spark join window", "and")),
        "match_highdf_flat": flat(MatchQuery("text", "the data stream table")),
        "wand_topk": lambda: wand_topk(reader, "text", "spark join window group", 10).collect(),
        "wand_highdf": lambda: wand_topk(reader, "text", "the data stream table", 10).collect(),
        "bool_query": flat(
            BoolQuery(must=[MatchQuery("text", "spark")], should=[MatchQuery("text", "window")])
        ),
        "dis_max": flat(
            DisMaxQuery(queries=[MatchQuery("text", "spark"), MatchQuery("text", "window")],
                        tie_breaker=0.3)
        ),
        "filtered_match": flat(MatchQuery("text", "spark join"),
                               filters={"term": {"lang": "en"}}),
        "facet_term": lambda: term_agg(
            s.score(MatchQuery("text", "spark")), reader.docs, "lang", 5
        ).collect(),
        "rrf_fusion": lambda: rrf_fuse(
            [s.score(MatchQuery("text", "spark join")), s.score(MatchQuery("text", "window agg"))],
            size=10, window=100,
        ).collect(),
        "sort_by_field": lambda: s.search(
            MatchQuery("text", "spark"), size=15, sort=[("n_chars", "desc", "last")]
        ).collect(),
        "ann_cosine_topk": lambda: similarity.cosine_topk(
            emb, "vec_id", "embedding", qv, 10
        ).collect(),
    }
    out = {}
    all_times = []
    for name, fn in cases.items():
        fn()  # warm (plans compile, caches fill)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        runs.sort()
        out[name] = round(runs[1], 4)  # median
        all_times.extend(runs)
    return out, all_times, spark


def main():
    t_total = time.time()
    tmp = tempfile.mkdtemp(prefix="nsbench_")
    results: dict = {"sf": SF_DIR, "unit": "sec"}
    try:
        idx32 = os.path.join(tmp, "idx32")
        b_hi = build_index(CPUS, idx32, n_shards=32)
        scaling = {}
        if not SKIP_SCALING:
            idx8 = os.path.join(tmp, "idx8")
            b_lo = build_index(LOW_CPUS, idx8, n_shards=32)
            eff = b_hi["docs_per_sec"] / ((CPUS / LOW_CPUS) * b_lo["docs_per_sec"])
            scaling = {
                f"local[{LOW_CPUS}]_docs_per_sec": b_lo["docs_per_sec"],
                f"local[{CPUS}]_docs_per_sec": b_hi["docs_per_sec"],
                "ratio": round(b_hi["docs_per_sec"] / b_lo["docs_per_sec"], 3),
                "efficiency_vs_linear": round(eff, 3),
            }
            shutil.rmtree(idx8, ignore_errors=True)
        queries, all_times, spark = run_queries(idx32)
        all_times.sort()
        p95 = all_times[max(int(len(all_times) * 0.95) - 1, 0)]
        spark.stop()
        results.update(
            {
                "metric": "index-build docs/sec + BM25 top-k query latency",
                "value": round(time.time() - t_total, 3),
                "queries": queries,
                "build": b_hi,
                "scaling": scaling,
                "query_p95_sec": round(p95, 4),
            }
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
