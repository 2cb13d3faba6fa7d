"""Deduplication operators for web-scale training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash — each shaped
for 100 TB: shuffles only on compact keys (hashes / bucket ids), map-side
combine everywhere, candidate generation via bucket joins instead of the
O(n²) cross join. Everything is Catalyst expressions; the only shuffle keys
are 64-bit hashes.

The reference's only dedup is upsert-by-_id (last-write-wins,
``index/Indexer.scala:97-99``) — covered by :func:`upsert_by_id`. The rest
is the content-level dedup a training pipeline needs on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# MinHash parameters: h_i(x) = (a_i * x + b_i) mod P, P Mersenne-ish prime
MINHASH_PRIME = (1 << 61) - 1


def upsert_by_id(df: DataFrame, id_col: str, seq_col: str) -> DataFrame:
    """Last-write-wins by id (reference delete-then-add on _id): keep the row
    with max(seq_col) per id, ties broken arbitrarily-but-deterministically."""
    w = Window.partitionBy(id_col).orderBy(F.desc(seq_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact content hash (sha256). One shuffle on a
    64-char key; at scale swap the full groupBy for a pre-aggregated
    map-side combine — Spark does this automatically for min()."""
    h = F.sha2(F.col(text_col), 256).alias("content_sha")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
    return keep


def _shingles_from_tokens(toks, n: int):
    """Word n-gram shingles (distinct) from a BOUND token-array column.

    ``toks`` must be a column attribute, not an inline expression: codegen
    re-evaluates a lambda-embedded expression per array element, which
    would re-tokenize the document once per token — O(tokens²) (the same
    pitfall measured at 241 s vs 2 s in query/suggest.py)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def _toks(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda t: F.length(t) > 0)


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int, out: str):
    """(id, shingle) rows — tokenizes into a bound column first."""
    return df.select(
        F.col(id_col).alias("_id"), _toks(text_col).alias("__toks")
    ).select("_id", F.explode(_shingles_from_tokens(F.col("__toks"), n)).alias(out))


def derive_shingle_cap(shingle_df_hist, pair_budget: int) -> int:
    """Largest df cap whose surviving shingles emit ≤ ``pair_budget``
    candidate pairs (Σ over kept shingles of df·(df−1)/2) — the stated
    100 TB policy for the quadratic in-bucket join: pick the budget from
    the cluster's shuffle capacity, not the cap from folklore.

    ``shingle_df_hist`` is [(df, n_shingles_at_df)] sorted any order.
    Greedy from the smallest df up is exact-optimal for a df-threshold
    rule: keeping any shingle at df' > cap while dropping one at df ≤ cap
    can only increase the pair count."""
    total = 0
    cap = 1  # df=1 shingles emit no pairs; always safe
    for dfv, n_sh in sorted(shingle_df_hist):
        add = n_sh * (dfv * (dfv - 1) // 2)
        if total + add > pair_budget:
            break
        total += add
        cap = dfv
    return cap


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 500,
    pair_budget: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index:
    explode distinct shingles → self-join on shingle → pair intersection
    counts → |A∩B| / (|A| + |B| - |A∩B|) ≥ threshold.

    ``max_shingle_df`` drops ubiquitous shingles before the pair join (the
    classic prefix-filter guard). The boundary is QUADRATIC: a shingle at
    the cap generates ~cap²/2 candidate pairs in one join key, so the
    default stays low (500 → ≤125k pairs per hot shingle). Dropping a
    shingle can only lower a pair's computed Jaccard (both sides lose it),
    so the guard trades recall near the threshold, never precision.

    ``pair_budget`` is the 100 TB policy knob and overrides
    ``max_shingle_df``: the cap is DERIVED from the corpus's own shingle-df
    histogram so the total candidate-pair count stays ≤ budget
    (:func:`derive_shingle_cap`). The histogram is a two-level aggregate
    (shingle→df, df→count) whose result is ≤ max(df) rows — a tiny
    driver-side collect, independent of corpus size. Size the budget from
    shuffle capacity (e.g. executors × a few 10⁸); corpora whose useful
    recall needs a cap beyond any sane budget should route through
    :func:`minhash_lsh_pairs` — the sub-quadratic scale path.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = _exploded_shingles(df, id_col, text_col, n, "sh")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    if pair_budget is not None:
        hist = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
            .groupBy("_df").agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        max_shingle_df = derive_shingle_cap([(r["_df"], r["_n"]) for r in hist], pair_budget)
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df")).where(
            F.col("_df") > max_shingle_df
        )
        sh = sh.join(hot.select("sh"), "sh", "left_anti")
    a = sh.select(F.col("_id").alias("id_a"), "sh")
    b = sh.select(F.col("_id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sza"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_szb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def _md5_long(col, salt: str | None = None):
    """Cross-engine 60-bit hash: first 15 hex chars of md5 as int64.

    Identical in Spark (conv) and DuckDB (CAST('0x…' AS BIGINT)) — the
    oracle-mode hash family for the correctness gate. xxhash64 stays the
    production default (one JVM intrinsic vs md5+hex parse)."""
    if salt is not None:
        col = F.concat(col, F.lit(salt))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>[num_hashes]) — min over shingle-hash permutations.

    One explode + one groupBy(id) with num_hashes min() aggregates: a single
    shuffle keyed on id, map-side combined, all JVM-side (xxhash64 + modular
    arithmetic on longs). ``hash_fn="md5"`` switches to the DuckDB-expressible
    md5-derived family (gate oracle mode; same plan shape, slower hash)."""
    sh = _exploded_shingles(df, id_col, text_col, n, "_sh")
    if hash_fn == "md5":
        # h_i(sh) = md5_long(sh + "|i") — shingles are space-joined word
        # tokens, so '|' never collides with content
        aggs = [
            F.min(_md5_long(F.col("_sh"), f"|{i}")).alias(f"h{i}") for i in range(num_hashes)
        ]
    else:
        sh = sh.select("_id", (F.abs(F.xxhash64("_sh")) % MINHASH_PRIME).alias("h"))
        # (a*h + b) mod P in double would overflow; use pmod on decimal-safe
        # longs: a*h mod P via (a mod P)(h mod P) — still overflows int64;
        # instead use the standard trick of hashing with xxhash64(h, i) per
        # permutation, an equally valid min-wise independent family.
        aggs = [
            F.min(F.abs(F.xxhash64(F.col("h"), F.lit(i)))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    sig = sh.groupBy("_id").agg(*aggs)
    return sig.select(
        F.col("_id").alias(id_col), F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    verify_threshold: float | None = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash + banded LSH candidate pairs, optionally verified with the
    signature-estimated Jaccard (fraction of equal minhashes).

    shingle→minhash→band→bucket-join: candidates only form inside a
    (band, band_hash) bucket — the shuffle is keyed on 64-bit bucket hashes,
    never on document content. Returns (id_a, id_b, est_jaccard).
    ``hash_fn="md5"`` selects the oracle-expressible minhash family; the
    band bucket key stays xxhash64 either way (internal only — equal band
    values ⇔ equal bucket, so the output is hash-family-pure)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed, hash_fn)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "sig", "bb.band", "bb.bh")
    a = banded.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bh")
    b = banded.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    est = cand.withColumn(
        "est_jaccard",
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z))
        / F.lit(float(num_hashes)),
    ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    if verify_threshold is not None:
        est = est.where(F.col("est_jaccard") >= verify_threshold)
    return est


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, hash_fn: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash over word tokens weighted by tf, pure Catalyst:
    explode tokens → xxhash64 → per-bit ±tf sums → sign bits → packed long.

    One shuffle (groupBy id) carrying ``bits`` small sums; bit extraction
    uses shiftright/& on longs — no UDF. ``hash_fn="md5"`` uses the 60-bit
    md5-derived family (oracle mode; pass bits=60 with it)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda t: F.length(t) > 0
    )
    t = df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("tok"))
    h = _md5_long(F.col("tok")) if hash_fn == "md5" else F.xxhash64("tok")
    tf = t.groupBy("_id", "tok").agg(F.count(F.lit(1)).alias("tf")).withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {i}) & 1) = 1"), F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = tf.groupBy("_id").agg(*aggs)
    packed = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {i})") * bit
        packed = term if packed is None else packed + term
    return sums.select(F.col("_id").alias(id_col), packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, candidates
    via (max_hamming+1) band buckets — pigeonhole: ≤ h differing bits over
    h+1 bands leave ≥1 band identical — verified with bit_count(xor).
    (Bits past band_bits·n_bands sit in no band, which only ADDS candidates,
    never loses one.)"""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    if band_bits < 1:
        raise ValueError(f"max_hamming={max_hamming} too large for {bits}-bit simhash")
    band_mask = (1 << band_bits) - 1
    sh = simhash(df, id_col, text_col, bits, hash_fn)
    bands = sh.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(simhash, {band_bits * b}) & {band_mask}").alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bh")
    a = bands.select(F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bh")
    b = bands.select(F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
