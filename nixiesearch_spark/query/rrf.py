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
