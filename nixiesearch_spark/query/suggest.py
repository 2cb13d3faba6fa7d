"""Autocomplete suggestions: shingle table + 4-way candidate retrieval +
RRF fusion.

Reference design (``core/suggest/*``, SURVEY.md §3.3): index side generates
sliding-window shingles of 1..3 analyzed tokens per suggest field
(``SuggestCandidates.scala:8-21``); query side runs FOUR completion queries
— prefix, fuzzy distance-1, fuzzy distance-2, infix regex ``.*q.*`` —
against the suggest structure (``GeneratedSuggestions.scala:41-91``) and
fuses them with RRF scale=60, case-insensitive
(``rank/RRFSuggestionRanker.scala:12-31``), taking ``count``.

Spark shape: the suggest table is a (suggestion, freq) parquet sorted by
suggestion — prefix queries push ``LIKE 'q%'`` (converted by Catalyst to
StartsWith → parquet min/max skip); fuzzy branches pre-prune with a length
band before ``levenshtein`` (built-in JVM expression), the analog of the
reference's FST automaton cutting the candidate space.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nixiesearch_spark.analysis import tokenize_col
from nixiesearch_spark.query.ranks import rank_limited

RRF_SCALE = 60.0
MAX_SHINGLE = 3


def shingles_col(text_col, max_n: int = MAX_SHINGLE):
    """Array of 1..max_n-token shingles (analyzed), order-preserving."""
    toks = tokenize_col(text_col)

    def gram(n: int):
        # NOTE: a 2-arg lambda would be treated as (element, index) by
        # F.transform — keep the closure single-argument
        return lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))

    parts = []
    for n in range(1, max_n + 1):
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
        parts.append(
            F.when(F.size(toks) >= n, F.transform(idx, gram(n))).otherwise(F.array())
        )
    return F.flatten(F.array(*parts))


# suggestion-length partition cap: dirs slen=1..LEN_CAP, longer shingles
# pool in the LEN_CAP bucket (they are rare; exact length predicates still
# apply inside it)
LEN_CAP = 32


def build_suggest(
    spark: SparkSession, docs: DataFrame, text_col: str, index_dir: str, field: str
) -> None:
    """Build the suggest table for ``field`` from stored docs content.

    Layout: partitioned by capped suggestion length (slen), sorted by
    suggestion within files. The reference's FST automatons bound fuzzy
    candidates by edit-distance-reachable lengths; here the slen directory
    prune is that bound (a fuzzy-1 query reads 3 of ~32 directories, never
    the whole table), while the sort keeps prefix queries on parquet
    min/max skipping inside each directory."""
    sugg = (
        docs.select(F.explode(shingles_col(F.col(text_col))).alias("suggestion"))
        .groupBy("suggestion")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("slen", F.least(F.length("suggestion"), F.lit(LEN_CAP)))
    )
    (
        sugg.repartitionByRange(8, "suggestion")
        .sortWithinPartitions("suggestion")
        .write.mode("overwrite")
        .partitionBy("slen")
        .parquet(os.path.join(index_dir, "suggest", f"field={field}"))
    )


def load_suggest(spark: SparkSession, index_dir: str, field: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "suggest", f"field={field}"))


def _ranked(branch: DataFrame, window: int) -> DataFrame:
    # rank over the already-limited window frame, window-function-free
    # (ranks.rank_limited): no WindowExec node, no global-window warning
    top = branch.orderBy(F.desc("freq"), F.asc("suggestion")).limit(window)
    return rank_limited(
        top, [F.desc("freq"), F.asc("suggestion")], ["suggestion"], "rank"
    )


def suggest(
    sugg_table: DataFrame, text: str, count: int = 10, window: int = 50
) -> DataFrame:
    """4-branch completion + RRF fusion → (suggestion, score) top ``count``."""
    q = text.lower().strip()
    s = F.col("suggestion")
    lenq = len(q)
    has_slen = "slen" in sugg_table.columns

    def _band(df, lo: int | None, hi: int | None):
        """Redundant predicate on the slen PARTITION column (length(s) is a
        computed expression and can never prune directories; slen can)."""
        if not has_slen:
            return df
        if lo is not None:
            df = df.where(F.col("slen") >= min(max(lo, 1), LEN_CAP))
        if hi is not None and hi < LEN_CAP:
            df = df.where(F.col("slen") <= hi)
        return df

    prefix = _band(sugg_table, lenq, None).where(s.startswith(q))
    fuzzy1 = _band(sugg_table, lenq - 1, lenq + 1).where(
        (F.length(s).between(lenq - 1, lenq + 1)) & (F.levenshtein(s, F.lit(q)) <= 1)
    )
    fuzzy2 = _band(sugg_table, lenq - 2, lenq + 2).where(
        (F.length(s).between(lenq - 2, lenq + 2)) & (F.levenshtein(s, F.lit(q)) <= 2)
    )
    infix = _band(sugg_table, lenq, None).where(s.contains(q))
    branches = [_ranked(b, window) for b in (prefix, fuzzy1, fuzzy2, infix)]
    union = branches[0]
    for b in branches[1:]:
        union = union.unionByName(b)
    fused = union.groupBy("suggestion").agg(
        F.sum(1.0 / (F.lit(RRF_SCALE) + F.col("rank"))).alias("score")
    )
    return fused.orderBy(F.desc("score"), F.asc("suggestion")).limit(count)
