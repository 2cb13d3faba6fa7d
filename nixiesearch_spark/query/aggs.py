"""Facet aggregations over the full filtered match set.

Reference semantics (``core/aggregate/TermAggregator.scala``,
``RangeAggregator.scala``, SURVEY.md §2.4): facets count over ALL matching
docs (a FacetsCollector beside the top-k collector), not the top-k page.
Here the match set is the score frame and facets are plain hash
aggregations — Spark gives partial+final aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_TERM_FACETS = 128 * 1024  # reference Aggregation.scala "all" cap


def merged_match_set(branches: list[DataFrame]) -> DataFrame:
    """Union of per-branch match sets — the facet input under RRF fusion
    (reference ``core/search/MergedFacetCollector.scala:17-33``: union of
    per-branch matching-doc bitsets per segment, then aggregate once)."""
    out = branches[0].select("docid")
    for b in branches[1:]:
        out = out.unionByName(b.select("docid"))
    return out.distinct()


def term_agg(
    match_set: DataFrame, docs: DataFrame, field: str, size: int | str = 10
) -> DataFrame:
    """Top-N value counts for ``field`` over the match set.
    Returns (term, count) ordered count desc, term asc (deterministic ties).
    ``size="all"`` → capped at MAX_TERM_FACETS (reference Aggregation.scala:40-43).
    """
    n = MAX_TERM_FACETS if size == "all" else int(size)
    joined = docs.join(match_set.select("docid"), "docid", "left_semi")
    return (
        joined.where(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("term"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("term"))
        .limit(n)
    )


def range_agg(
    match_set: DataFrame, docs: DataFrame, field: str, ranges: list[dict]
) -> DataFrame:
    """Counts per bucket; each range dict uses gt/gte/lt/lte keys with the
    reference's inclusivity semantics (RangeAggregator; open ends unbounded).
    Returns one row per input range: (range_from, range_to, count)."""
    joined = docs.join(match_set.select("docid"), "docid", "left_semi")
    aggs = []
    for i, r in enumerate(ranges):
        c = F.col(field).isNotNull()
        if "gt" in r:
            c = c & (F.col(field) > F.lit(r["gt"]))
        if "gte" in r:
            c = c & (F.col(field) >= F.lit(r["gte"]))
        if "lt" in r:
            c = c & (F.col(field) < F.lit(r["lt"]))
        if "lte" in r:
            c = c & (F.col(field) <= F.lit(r["lte"]))
        # coalesce: F.sum over an EMPTY match set is NULL, but a bucket
        # over zero matching docs counts 0 (and the driver-served route
        # already returns 0 — routes must agree)
        aggs.append(
            F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0)).alias(f"_r{i}")
        )
    row = joined.agg(*aggs)
    # unpivot to one row per range with bucket bounds as literals
    selects = []
    for i, r in enumerate(ranges):
        lo = r.get("gt", r.get("gte"))
        hi = r.get("lt", r.get("lte"))
        selects.append(
            F.struct(
                F.lit(lo).cast("double").alias("range_from"),
                F.lit(hi).cast("double").alias("range_to"),
                F.col(f"_r{i}").cast("long").alias("count"),
            )
        )
    return row.select(F.explode(F.array(*selects)).alias("b")).select(
        "b.range_from", "b.range_to", "b.count"
    )
