"""Extra benchmarks for the optimization rounds (guide §1: measure first).

NOT part of the driver contract — bench.py stays frozen. This harness
isolates the expensive phases the headline bench 'value' is made of:

  build  — IndexBuilder phase breakdown (docs/postings/pack/dictionary)
           over the deterministic scaling corpus at a chosen core count
  query  — per-case noop-sink isolation is already what bench.py measures
           (collect of ≤k rows ≈ noop); this mode re-times the serving
           warmup costs instead (reader warm, hnsw build, suggest build)

Usage:
  python bench_extra.py build  [n_docs] [cores]
  python bench_extra.py warmup [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def profile_build(n_docs: int, cores: int) -> dict:
    import shutil

    from nixiesearch_spark.corpus import write_corpus_parquet
    from nixiesearch_spark.index import IndexBuilder, IndexConfig
    from nixiesearch_spark.session import get_spark

    corpus = f"/tmp/ns_bench_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus):
        write_corpus_parquet(corpus, n_docs)
    spark = get_spark(f"bench-extra-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    out = tempfile.mkdtemp(prefix="nsbx_idx_")
    try:
        df = spark.read.parquet(corpus)
        n = df.count()
        b = IndexBuilder(spark, IndexConfig(text_fields=("content",), n_shards=32))
        t0 = time.time()
        b.build(df, out, resume=False)
        wall = time.time() - t0
        return {
            "mode": "build",
            "n_docs": n,
            "cores": cores,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1),
            "phases": dict(b.timings),
        }
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


def profile_warmup(sf_dir: str, cores: int) -> dict:
    """Time the non-case overhead inside bench.run_queries: reader warm,
    HNSW graph build, suggest table build (all inside the frozen bench's
    total 'value')."""
    import shutil

    from nixiesearch_spark.index import IndexBuilder, IndexConfig, IndexReader
    from nixiesearch_spark.pipeline import hnsw
    from nixiesearch_spark.query.suggest import build_suggest
    from nixiesearch_spark.session import get_spark

    out: dict = {"mode": "warmup", "sf": sf_dir, "cores": cores}
    spark = get_spark("bench-extra-build", cores=cores, shuffle_partitions=max(cores, 8))
    idx = tempfile.mkdtemp(prefix="nsbx_widx_")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        cfg = IndexConfig(text_fields=("text",), id_col="doc_id", n_shards=32)
        t = time.time()
        b = IndexBuilder(spark, cfg)
        b.build(df, idx, resume=False)
        out["index_build_sec"] = round(time.time() - t, 3)
        out["build_phases"] = dict(b.timings)
        spark.stop()

        t = time.time()
        spark = get_spark("bench-extra-query", cores=cores, serving=True)
        out["session_start_sec"] = round(time.time() - t, 3)
        t = time.time()
        reader = IndexReader(spark, idx).persist_hot()
        reader.packed.persist().count()
        reader.postings.count()
        reader.dictionary.count()
        reader.ordinal_map.count()
        out["reader_warm_sec"] = round(time.time() - t, 3)

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        hnsw_dir = tempfile.mkdtemp(prefix="nsbx_hnsw_")
        t = time.time()
        hnsw.build_hnsw(emb, "vec_id", "embedding", hnsw_dir, n_shards=8)
        out["hnsw_build_sec"] = round(time.time() - t, 3)
        shutil.rmtree(hnsw_dir, ignore_errors=True)

        sugg_dir = tempfile.mkdtemp(prefix="nsbx_sugg_")
        t = time.time()
        build_suggest(spark, reader.docs, "text", sugg_dir, "text")
        out["suggest_build_sec"] = round(time.time() - t, 3)
        shutil.rmtree(sugg_dir, ignore_errors=True)
        return out
    finally:
        spark.stop()
        shutil.rmtree(idx, ignore_errors=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 120000
        cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        print(json.dumps(profile_build(n, cores)))
    elif mode == "warmup":
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        print(json.dumps(profile_warmup(sf, cores)))
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
