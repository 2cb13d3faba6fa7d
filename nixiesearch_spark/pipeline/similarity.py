"""Similarity search over embedding columns (array<float>).

The reference's vector path is Lucene HNSW (``KnnQuery.scala``) — a
single-node graph index with no Spark analog. The Spark-native shapes:

- :func:`cosine_topk` — brute-force exact top-k: one scan, JVM-side
  ``aggregate``/``zip_with`` dot products, TakeOrderedAndProject. The
  correctness baseline, and at 100 TB still the right plan when the query
  batch is small (scan is embarrassingly parallel, no index to build).
- :func:`rp_lsh_buckets` / :func:`ann_lsh_topk` — random-hyperplane LSH:
  sign-bit signatures → bucket join → exact rerank of candidates. The scale
  path when query volume is high: candidates come from a hash-bucket join
  instead of a full scan.
- :func:`embedding_near_dup_pairs` — embedding-cosine near-duplicate pairs
  via the same LSH buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k. Query vector folds in as a literal
    array → Catalyst constant; the scan stays whole-stage-codegen'd."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def rp_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
) -> DataFrame:
    """Random-hyperplane signature: bucket = Σ 2^i·[v·h_i > 0] (a long).
    Pure Column math — the hyperplanes fold in as literal arrays."""
    planes = _hyperplanes(dim, n_planes, seed)
    return df.select(
        F.col(id_col), F.col(vec_col), _plane_sig(F.col(vec_col), planes).alias("bucket")
    )


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 16,
    seed: int = 42,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: filter to the query's LSH bucket (plus multiprobe
    neighbors at Hamming distance ≤ multiprobe_bits), exact-rerank with
    cosine. The bucket predicate pushes down to the (pre-bucketed) scan."""
    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i in range(n_planes):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    probes = {qsig}
    if multiprobe_bits >= 1:
        for i in range(n_planes):
            probes.add(qsig ^ (1 << i))
    if multiprobe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))
    bucketed = rp_lsh_buckets(df, id_col, vec_col, dim, n_planes, seed)
    cand = bucketed.where(F.col("bucket").isin([int(p) for p in probes]))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def kmeans_centroids(
    vectors: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd k-means over a driver-side sample (float64).

    At 100 TB the sample comes from a deterministic hash filter
    (pmod(xxhash64(id), N) == 0) — a few 10^5 vectors train centroids fine;
    the expensive part (assignment) stays fully distributed in
    :func:`ivf_assign`. Empty clusters keep their previous centroid."""
    v = np.asarray(vectors, dtype=np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(v), size=k, replace=False)
    cents = v[idx].copy()
    for _ in range(iters):
        # argmin ||v-c||² = argmax (v·c − |c|²/2): an N×k score matrix, not
        # the N×k×dim broadcast tensor (which would be ~150 GB at the
        # documented 10^5×768×256 sample scale). Same metric/tie-break as
        # ivf_assign, so training and assignment agree exactly.
        scores = v @ cents.T - (cents * cents).sum(1) / 2.0
        assign = scores.argmax(1)
        for j in range(k):
            m = v[assign == j]
            if len(m):
                cents[j] = m.mean(0)
    return cents


def _centroid_score(vec_col, centroid: np.ndarray):
    """argmin ||v-c||² ≡ argmax (v·c − |c|²/2); the score column for one
    centroid (centroid folds in as a literal array)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    half = float((centroid @ centroid) / 2.0)
    return _dot(vec_col, c) - F.lit(half)


def ivf_assign(df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """IVF bucket assignment: bucket = argmax_j (v·c_j − |c_j|²/2), pure
    Column math (k literal dot products per row, whole-stage codegen; ties
    break to the LOWEST centroid id via array_position-first-match). At
    scale this frame is written bucketed/partitioned by ``bucket`` so probe
    queries scan only the probed partitions."""
    scores = F.array(*[_centroid_score(F.col(vec_col), c) for c in centroids])
    bucket = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ivf_probes(query_vec: list[float], centroids: np.ndarray, n_probe: int) -> list[int]:
    """The ``n_probe`` bucket ids whose centroids are nearest the query —
    same argmax metric and tie-break as :func:`ivf_assign`."""
    q = np.asarray(query_vec, dtype=np.float64)
    scores = centroids @ q - (centroids * centroids).sum(1) / 2.0
    order = np.lexsort((np.arange(len(centroids)), -scores))
    return [int(x) for x in order[:n_probe]]


def ivf_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    path: str,
) -> None:
    """BUILD step: assign buckets and write the table hive-partitioned by
    ``bucket`` so probe queries prune to n_probe directories at the file
    listing level (``PartitionFilters`` in the scan — zero bytes read from
    unprobed buckets). ``repartition("bucket")`` first: the assignment
    exchange would otherwise leave every task holding rows of many buckets
    and the partitioned write would explode into tasks×buckets files."""
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    (
        assigned.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    pre_assigned: bool = False,
) -> DataFrame:
    """IVF probe search: scan the ``n_probe`` buckets whose centroids are
    nearest the query (same argmax metric as assignment), exact-rerank by
    cosine. n_probe = len(centroids) degrades gracefully to exact search.

    ``pre_assigned=True`` is the serving form: ``df`` already carries the
    ``bucket`` column (an :func:`ivf_build` table read back), so the probe
    predicate prunes partitions instead of recomputing the assignment over
    the full table per query — that recomputation scores all N vectors
    against all k centroids and defeats IVF's point. The inline-assign form
    (default) is only for one-shot/batch use where no index exists yet."""
    probes = ivf_probes(query_vec, centroids, n_probe)
    assigned = df if pre_assigned else ivf_assign(df, id_col, vec_col, centroids)
    cand = assigned.where(F.col("bucket").isin(probes))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col(id_col), F.round(cosine_sim(F.col(vec_col), qcol), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """SERVE step over an :func:`ivf_build` table: reads ONLY the probed
    bucket partitions (directory-level pruning — verify with
    ``PartitionFilters`` in ``.explain``)."""
    return ivf_topk(
        spark.read.parquet(path), id_col, vec_col, query_vec, centroids,
        k=k, n_probe=n_probe, pre_assigned=True,
    )


def block_join_topk(
    df: DataFrame,
    parent_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Parent/child block-join knn (reference TextListFieldCodec.scala:95-109
    nested embeddings + Lucene ToParentBlockJoinQuery with max score mode):
    score every CHILD vector, roll up max(child cosine) per parent, top-k
    parents. One scan + one hash agg + TakeOrderedAndProject — the
    Spark-native equivalent of the parent block join."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(parent_col).alias("parent_id"),
        cosine_sim(F.col(vec_col), q).alias("_c"),
    )
    agg = scored.groupBy("parent_id").agg(F.round(F.max("_c"), 6).alias("cosine"))
    return agg.orderBy(F.desc("cosine"), F.asc("parent_id")).limit(k)


def _plane_sig(vec_col, planes: np.ndarray):
    """Sign-bit signature column for a literal hyperplane set (the
    rp_lsh_buckets kernel, reusable for re-split sub-signatures)."""
    sig = None
    for i in range(len(planes)):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(vec_col, h) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {i})") * bit
        sig = term if sig is None else sig + term
    return sig


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    max_bucket_size: int = 1000,
    resplit_planes: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold. Candidates =
    same LSH bucket (recall grows with fewer planes); exact cosine verify.
    Returns (id_a, id_b, cosine).

    Hot-bucket guard (the within-key self-join is quadratic — at 10^9
    clustered embeddings one bucket can hold 10^6+ vectors → 10^12 candidate
    pairs on one join key, the dedup.ngram_jaccard max_shingle_df hazard):
    buckets above ``max_bucket_size`` are re-split with ``resplit_planes``
    extra hyperplanes (a different seed) before pairing; groups STILL above
    the cap after the re-split are near-identical by construction (they
    agree on n_planes + resplit_planes sign bits — e.g. an all-identical
    corpus, which no hyperplane can separate), and emit STAR edges
    (group-min id ↔ every other member) instead of all pairs: O(group)
    output that preserves duplicate-set connectivity for clustering, at the
    cost of not enumerating every intra-cluster pair. Group-count frames are
    tiny (≤ distinct buckets) and broadcast."""
    b = rp_lsh_buckets(df, id_col, vec_col, dim, n_planes, seed)
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bc"))
    b = b.join(F.broadcast(counts), "bucket")
    planes2 = _hyperplanes(dim, resplit_planes, seed + 104729)
    b = b.withColumn(
        "_sub",
        F.when(
            F.col("_bc") > max_bucket_size, _plane_sig(F.col(vec_col), planes2)
        ).otherwise(F.lit(-1).cast("long")),
    ).drop("_bc")
    counts2 = b.groupBy("bucket", "_sub").agg(F.count(F.lit(1)).alias("_gc"))
    b = b.join(F.broadcast(counts2), ["bucket", "_sub"])
    small = b.where(F.col("_gc") <= max_bucket_size)
    l = small.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket", "_sub"
    )
    r = small.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket", "_sub"
    )
    cand = (
        l.join(r, ["bucket", "_sub"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "va", "id_b", "vb")
    )
    big = b.where(F.col("_gc") > max_bucket_size)
    reps = big.groupBy("bucket", "_sub").agg(
        F.min(id_col).alias("id_a"), F.min_by(vec_col, F.col(id_col)).alias("va")
    )
    star = (
        big.join(F.broadcast(reps), ["bucket", "_sub"])
        .where(F.col(id_col) != F.col("id_a"))
        .select("id_a", "va", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    )
    return (
        cand.unionByName(star)
        .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
