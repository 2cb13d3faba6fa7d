"""Reciprocal-rank fusion of ranked result lists.

Reference ``api/query/rerank/RRFQuery.scala:23-79``: each branch retrieves a
``window`` of ranked hits; fused score = Σ_branches 1/(k + rank) with
k=60 default and rank = position in the branch list (0-based); sort desc,
take size. Sorting is rejected under RRF (reference Searcher.scala:119).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60.0


def rrf_fuse(
    branches: list[DataFrame],
    size: int = 10,
    window: int = 100,
    k: float = DEFAULT_RRF_K,
) -> DataFrame:
    """branches: score frames (docid, score). Returns (docid, score) where
    score is the fused RRF score, ordered desc, docid asc, limit size.

    Each branch is rank-truncated to ``window`` first (per-branch top-k via
    TakeOrderedAndProject — tiny frames), then fused with a cheap union +
    groupBy; no large shuffle at any point.
    """
    ranked = []
    for i, b in enumerate(branches):
        top = b.orderBy(F.desc("score"), F.asc("docid")).limit(window)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        ranked.append(
            top.select("docid", (F.row_number().over(w) - 1).alias("rank"))
        )
    union = ranked[0]
    for r in ranked[1:]:
        union = union.unionByName(r)
    fused = union.groupBy("docid").agg(
        F.sum(1.0 / (F.lit(float(k)) + F.col("rank"))).alias("score")
    )
    return fused.orderBy(F.desc("score"), F.asc("docid")).limit(size)


def rrf_fuse_matches(searcher, matches, size: int = 10, window: int = 100,
                     k: float = DEFAULT_RRF_K) -> DataFrame:
    """Branch-fused RRF for match-query branches: ONE postings scan + one
    aggregation produces every branch's scores as columns; the per-branch
    rank lists come from the persisted frame (tiny re-reads) and fusion runs
    driver-side on ≤ branches×window rows — mirroring the reference's
    in-process RRF (RRFQuery.scala re-queries branches then fuses locally).
    Results identical to rrf_fuse over separate score frames."""
    per_doc, live, metas = searcher._fused(
        [("dismax", m) for m in matches], kind="branches"
    )
    per_doc = per_doc.persist()
    try:
        fused: dict = {}
        for i in live:
            need = metas[i]["n"] if metas[i]["op"] == "and" else 1
            rows = (
                per_doc.where(F.col(f"_n{i}") >= need)
                .select("docid", F.col(f"_s{i}").alias("score"))
                .orderBy(F.desc("score"), F.asc("docid"))
                .limit(window)
                .collect()
            )
            for rank, r in enumerate(rows):
                fused[r["docid"]] = fused.get(r["docid"], 0.0) + 1.0 / (float(k) + rank)
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
        spark = searcher.spark
        if not top:
            return spark.createDataFrame([], "docid long, score double")
        return spark.createDataFrame(
            [(int(d), float(sc)) for d, sc in top], "docid long, score double"
        )
    finally:
        per_doc.unpersist()
