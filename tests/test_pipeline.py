"""Dedup / similarity / textstats / multimodal pipeline operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nixiesearch_spark.pipeline import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", 1),
        (2, "the quick brown fox jumps over the lazy dog", 2),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog", 1),  # near dup
        (4, "completely different content about spark and data", 1),
        (5, "der hund und die katze ist das haus", 1),
        (6, "le chat et la maison est les arbres", 1),
    ]
    return spark.createDataFrame(rows, "id long, text string, seq int")


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs, "text", "id").collect()
    by_id = {r["id"]: r["dup_count"] for r in out}
    assert by_id[1] == 2  # docs 1+2 collapse, min id kept
    assert 2 not in by_id
    assert by_id[3] == 1


def test_upsert_by_id(spark, docs):
    out = dedup.upsert_by_id(docs, "id", "seq")
    assert out.count() == 6  # ids unique here → all kept
    dup = docs.union(docs.withColumn("seq", F.col("seq") + 10))
    kept = dedup.upsert_by_id(dup, "id", "seq")
    assert kept.count() == 6
    assert all(r["seq"] > 10 for r in kept.collect())  # last write wins


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "id", "text", n=3, threshold=0.3).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in got and 0.3 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_ngram_jaccard_pair_budget(spark):
    """100 TB policy guard: a synthetic hot-shingle corpus (boilerplate
    shared by every doc) must stay within the candidate-pair budget — the
    cap is derived from the shingle-df histogram, and the derived cap's
    kept shingles emit ≤ budget pairs."""
    # 40 docs all sharing one boilerplate sentence (hot shingles, df=40),
    # each with a unique tail (df=1 shingles) + 3 pairs of true near-dups
    # sharing a df=2 shingle run
    rows = []
    for i in range(40):
        rows.append((i, f"shared boilerplate header for all documents here uniq{i} tail{i} word{i}"))
    for j in range(3):
        rows.append((100 + j, f"cluster {j} common run of tokens alpha beta gamma delta {j}"))
        rows.append((200 + j, f"cluster {j} common run of tokens alpha beta gamma delta x{j}"))
    docs = spark.createDataFrame(rows, "id long, text string")

    # histogram math: derive_shingle_cap is exact on a known histogram
    assert dedup.derive_shingle_cap([(1, 100), (2, 10), (40, 5)], 10) == 2
    assert dedup.derive_shingle_cap([(1, 100), (2, 10), (40, 5)], 10_000) == 40
    assert dedup.derive_shingle_cap([(5, 1)], 9) == 1  # even df=5 too hot

    budget = 50  # far below the hot-shingle blowup (each df=40 shingle → 780 pairs)
    sh = dedup._exploded_shingles(docs, "id", "text", 3, "sh")
    hist = (
        sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        .groupBy("_df").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    cap = dedup.derive_shingle_cap([(r["_df"], r["_n"]) for r in hist], budget)
    kept_pairs = sum(
        r["_n"] * (r["_df"] * (r["_df"] - 1) // 2) for r in hist if r["_df"] <= cap
    )
    assert kept_pairs <= budget
    assert cap < 40  # the hot boilerplate shingles are dropped

    # end-to-end: budgeted run completes and still finds the df≤cap near-dups
    out = dedup.ngram_jaccard_pairs(
        docs, "id", "text", n=3, threshold=0.1, pair_budget=budget
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # threshold 0.1: capping drops the df=6 mid-run shingles too, leaving the
    # cluster pair only its 2 df=2 shingles (jaccard ~0.125 of the PRE-cap sizes)
    assert (100, 200) in got  # df=2 cluster pair survives the cap
    # no pair is produced solely by hot shingles: the 40 boilerplate docs
    # share ONLY df=40 shingles, so none of them may pair up
    assert not any(a < 40 and b < 40 for a, b in got)


def test_minhash_lsh(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", n=3, num_hashes=32, bands=16, verify_threshold=0.4
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert got.get((1, 2)) == 1.0  # identical signatures always collide
    assert (1, 4) not in got


def test_ivf_ann(spark, vecs):
    """IVF bucket search: probing ALL buckets equals exact brute force;
    fewer probes still find the planted near-dup (high recall on the easy
    case) and assignment is deterministic."""
    import numpy as np

    from nixiesearch_spark.pipeline import similarity

    rows = sorted(vecs.collect(), key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cents = similarity.kmeans_centroids(mat, k=4, iters=8, seed=42)
    q = rows[0]["embedding"]
    rest = vecs.where("vec_id <> 0")
    exact = [(r["vec_id"], r["cosine"]) for r in
             similarity.cosine_topk(rest, "vec_id", "embedding", q, 10).collect()]
    full_probe = [(r["vec_id"], r["cosine"]) for r in
                  similarity.ivf_topk(rest, "vec_id", "embedding", q, cents,
                                      k=10, n_probe=4).collect()]
    assert full_probe == exact  # all-bucket probe ≡ exact search
    one_probe = [r["vec_id"] for r in
                 similarity.ivf_topk(rest, "vec_id", "embedding", q, cents,
                                     k=10, n_probe=1).collect()]
    assert one_probe[0] == 1  # planted near-dup of vec 0 lands in q's bucket
    # deterministic assignment: rerun gives identical buckets
    a1 = similarity.ivf_assign(rest, "vec_id", "embedding", cents).collect()
    a2 = similarity.ivf_assign(rest, "vec_id", "embedding", cents).collect()
    assert sorted((r["vec_id"], r["bucket"]) for r in a1) == sorted(
        (r["vec_id"], r["bucket"]) for r in a2
    )


def test_minhash_simhash_md5_mode(spark, docs):
    # oracle-mode md5 hash family behaves like xxhash64: identical docs
    # collide with est_jaccard 1.0 / hamming 0, unrelated docs don't pair
    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", n=3, num_hashes=32, bands=16,
        verify_threshold=0.4, hash_fn="md5",
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert got.get((1, 2)) == 1.0
    assert (1, 4) not in got
    spairs = dedup.simhash_pairs(
        docs, "id", "text", max_hamming=0, bits=60, hash_fn="md5"
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in spairs} == {(1, 2)}
    # md5 simhash is 60-bit: all signatures fit
    sh = dedup.simhash(docs, "id", "text", bits=60, hash_fn="md5").collect()
    assert all(0 <= r["simhash"] < (1 << 60) for r in sh)


def test_simhash(spark, docs):
    sh = {r["id"]: r["simhash"] for r in dedup.simhash(docs, "id", "text").collect()}
    assert sh[1] == sh[2]  # identical text → identical simhash
    ham13 = bin((sh[1] ^ sh[3]) & (2**64 - 1)).count("1")
    ham14 = bin((sh[1] ^ sh[4]) & (2**64 - 1)).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated
    pairs = dedup.simhash_pairs(docs, "id", "text", max_hamming=ham13).collect()
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in pairs}
    # max_hamming > 3 widens to max_hamming+1 bands (pigeonhole stays sound)
    wide = dedup.simhash_pairs(docs, "id", "text", max_hamming=5).collect()
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in wide}


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[1] = base[0] * 1.001 + 0.001  # near-dup of vec 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, vecs):
    q = vecs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = similarity.cosine_topk(vecs, "vec_id", "embedding", q, 3).collect()
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == pytest.approx(1.0)
    assert got[1]["vec_id"] == 1 and got[1]["cosine"] > 0.999
    # numpy cross-check of full ranking
    import numpy as np

    rows = vecs.collect()
    m = np.array([r["embedding"] for r in rows])
    ids_ = np.array([r["vec_id"] for r in rows])
    qv = np.array(q)
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    exp = ids_[np.argsort(-cos)][:3].tolist()
    assert [r["vec_id"] for r in got] == exp


def test_ann_lsh_recall(spark, vecs):
    q = vecs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = similarity.ann_lsh_topk(
        vecs, "vec_id", "embedding", q, k=3, n_planes=8, multiprobe_bits=2
    ).collect()
    assert got and got[0]["vec_id"] == 0  # the query vector itself must be found
    assert {r["vec_id"] for r in got} >= {0, 1}  # near-dup found too


def test_embedding_near_dup(spark, vecs):
    pairs = similarity.embedding_near_dup_pairs(
        vecs, "vec_id", "embedding", dim=16, threshold=0.99, n_planes=6
    ).collect()
    assert (0, 1) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_textstats(spark, docs):
    out = {r["id"]: r for r in textstats.with_textstats(docs, "text").collect()}
    assert out[1]["ws_tokens"] == 9
    assert out[1]["word_tokens"] == 9  # no punctuation
    assert out[1]["punct_ratio"] == 0.0
    assert out[1]["stopword_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    assert out[1]["lang_pred"] == "en"
    assert out[5]["lang_pred"] == "de"
    assert out[6]["lang_pred"] == "fr"
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[1]["fingerprint"] != out[3]["fingerprint"]


def test_multimodal_plumbing(spark):
    media = multimodal.make_fake_media(spark, 25)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 25
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    # real decoders: every image (png/bmp/ppm) and wav decodes; features
    # carry real dimensions ([w, h, c, ...] must match the media metadata)
    meta = {r["media_id"]: r for r in media.collect()}
    for r in by_kind["image"]:
        assert r["decoded"], r["media_id"]
        assert len(r["features"]) == 69
        w, h, c = r["features"][:3]
        assert (w, h, c) == (meta[r["media_id"]]["width"], meta[r["media_id"]]["height"], 3.0)
        assert all(x in (0.0, 1.0) for x in r["features"][5:])  # aHash bits
    for r in by_kind["audio"]:
        assert r["decoded"] and len(r["features"]) == 5
        dur_ms = r["features"][0] * 1000
        assert abs(dur_ms - meta[r["media_id"]]["duration_ms"]) <= 1.0
    # no video codec in-container → declared hash fallback
    for r in by_kind["video"]:
        assert not r["decoded"]
        assert len(r["features"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["features"])
    # deterministic: same payload → same sha + features
    again = {r["media_id"]: (r["payload_sha"], r["features"]) for r in feats.collect()}
    first = {r["media_id"]: (r["payload_sha"], r["features"]) for r in rows}
    assert again == first


def test_ivf_build_serve_partition_pruning(spark, vecs, tmp_path):
    """Serve path reads ONLY probed bucket partitions: results equal the
    inline-assign form, and the scan's partition count < total buckets
    (directory-level pruning via the hive bucket= partition column)."""
    rows = sorted(vecs.collect(), key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cents = similarity.kmeans_centroids(mat, k=4, iters=8, seed=42)
    q = rows[0]["embedding"]
    rest = vecs.where("vec_id <> 0")
    path = str(tmp_path / "ivf")
    similarity.ivf_build(rest, "vec_id", "embedding", cents, path)

    out = similarity.ivf_topk_indexed(
        spark, path, "vec_id", "embedding", q, cents, k=10, n_probe=2
    )
    inline = similarity.ivf_topk(
        rest, "vec_id", "embedding", q, cents, k=10, n_probe=2
    )
    assert [(r["vec_id"], r["cosine"]) for r in out.collect()] == [
        (r["vec_id"], r["cosine"]) for r in inline.collect()
    ]

    # pruning evidence: the probe predicate lands in the scan's
    # PartitionFilters (directory-level skip — unprobed bucket dirs are
    # never listed into the scan), not as a post-scan data filter
    probes = set(similarity.ivf_probes(q, cents, 2))
    pruned = spark.read.parquet(path).where(F.col("bucket").isin(list(probes)))
    pruned.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0] and "IN" in pf[0].upper(), plan
    all_buckets = {
        int(f.split("bucket=")[1].split("/")[0])
        for f in spark.read.parquet(path).inputFiles()
    }
    assert len(all_buckets) > 2  # data actually spans >2 buckets


def test_near_dup_hot_bucket_guard(spark):
    """Adversarial all-identical corpus: every vector lands in one LSH
    bucket that no hyperplane re-split can separate — the guard must emit
    O(n) star edges (connectivity preserved) instead of O(n²) pairs."""
    n = 3000
    rows = [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.embedding_near_dup_pairs(
        df, "vec_id", "embedding", dim=4, threshold=0.9, n_planes=4,
        max_bucket_size=100,
    ).collect()
    # star shape: exactly n-1 edges, all anchored at the min id, cosine 1.0
    assert len(out) == n - 1
    assert {r["id_a"] for r in out} == {0}
    assert {r["id_b"] for r in out} == set(range(1, n))
    assert all(r["cosine"] == 1.0 for r in out)


def test_near_dup_resplit_separates_clusters(spark):
    """A hot bucket holding two distinct clusters is separated by the
    re-split planes: cross-cluster non-dup pairs are never even candidates,
    and within-cluster dups still surface as full pairs when the sub-group
    fits the cap."""

    rng = np.random.default_rng(7)
    a = rng.standard_normal(16)
    bvec = rng.standard_normal(16)
    rows = [(i, [float(x) for x in a + 1e-3 * rng.standard_normal(16)]) for i in range(60)]
    rows += [(100 + i, [float(x) for x in bvec + 1e-3 * rng.standard_normal(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # n_planes=0 would be degenerate; use 1 plane so both clusters often
    # share a bucket, cap forces the re-split
    out = similarity.embedding_near_dup_pairs(
        df, "vec_id", "embedding", dim=16, threshold=0.99, n_planes=1,
        max_bucket_size=80, resplit_planes=8,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    # within-cluster pairs exist; no cross-cluster pair survives
    assert any(a_ < 100 and b_ < 100 for a_, b_ in pairs)
    assert any(a_ >= 100 and b_ >= 100 for a_, b_ in pairs)
    assert not any(a_ < 100 <= b_ for a_, b_ in pairs)


def test_hnsw_recall_and_determinism(spark, tmp_path):
    """Per-shard HNSW: recall@10 >= 0.9 vs the exact scan, and two builds
    over the same data return identical top-k (deterministic levels +
    insert order — no RNG state anywhere)."""
    from nixiesearch_spark.pipeline import hnsw, similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = e.where(F.col("vec_id") == 7).first()["embedding"]
    exact = [
        r["vec_id"]
        for r in similarity.cosine_topk(e, "vec_id", "embedding", qv, 10).collect()
    ]
    hits = []
    for run in range(2):
        d = str(tmp_path / f"g{run}")
        hnsw.build_hnsw(e, "vec_id", "embedding", d, n_shards=4)
        got = [
            (r["id"], r["cosine"])
            for r in hnsw.hnsw_topk(spark, qv, k=10, graph_dir=d).collect()
        ]
        hits.append(got)
    assert hits[0] == hits[1], (hits[0], hits[1])
    ids = [i for i, _ in hits[0]]
    recall = len(set(ids) & set(exact)) / len(exact)
    assert recall >= 0.9, (recall, ids, exact)


def test_hnsw_driver_matches_cluster(spark, tmp_path):
    """The search-head pyarrow serve path returns exactly the distributed
    path's rows (shared beam kernel, same final round/order plan)."""
    from nixiesearch_spark.pipeline import hnsw

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = e.where(F.col("vec_id") == 11).first()["embedding"]
    d = str(tmp_path / "g")
    hnsw.build_hnsw(e, "vec_id", "embedding", d, n_shards=4)
    drv = hnsw.hnsw_topk_driver(spark, qv, k=10, ef_search=64, graph_dir=d)
    assert drv is not None  # local dir, small graph: driver mode engages
    got_d = [(r["id"], r["cosine"]) for r in drv.collect()]
    got_c = [
        (r["id"], r["cosine"])
        for r in hnsw.hnsw_topk(spark, qv, k=10, graph_dir=d, mode="cluster").collect()
    ]
    assert got_d == got_c, (got_d, got_c)


def test_hnsw_incremental_insert(spark, tmp_path):
    """insert_hnsw appends a batch into existing shard graphs: recall holds
    vs the exact scan over the grown corpus, untouched shards' partition
    files stay byte-identical, and inserting an already-present id is a
    no-op for that node."""
    import glob
    import hashlib

    from nixiesearch_spark.pipeline import hnsw, similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = e.where(F.col("vec_id") < 400)
    d = str(tmp_path / "g")
    hnsw.build_hnsw(base, "vec_id", "embedding", d, n_shards=4)

    def shard_digest(sd):
        h = hashlib.sha256()
        for f in sorted(glob.glob(f"{d}/shard={sd}/*.parquet")):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    # batch targets ONLY shard 1 (ids ≡ 1 mod 4)
    batch = e.where((F.col("vec_id") >= 400) & (F.col("vec_id") % 4 == 1))
    n_batch = batch.count()
    assert n_batch > 0
    before = {sd: shard_digest(sd) for sd in (0, 2, 3)}
    touched = hnsw.insert_hnsw(spark, batch, "vec_id", "embedding", d)
    assert touched == [1]
    after = {sd: shard_digest(sd) for sd in (0, 2, 3)}
    assert before == after  # untouched shards byte-identical
    graph = spark.read.parquet(d)
    grown = base.unionByName(batch)
    assert graph.count() == grown.count()
    qv = e.where(F.col("vec_id") == 401).first()["embedding"]
    exact = [
        r["vec_id"]
        for r in similarity.cosine_topk(grown, "vec_id", "embedding", qv, 10).collect()
    ]
    got = [r["id"] for r in hnsw.hnsw_topk(spark, qv, k=10, graph_dir=d).collect()]
    assert len(set(got) & set(exact)) / len(exact) >= 0.9, (got, exact)
    # re-inserting existing ids: node count unchanged
    hnsw.insert_hnsw(spark, batch, "vec_id", "embedding", d)
    assert spark.read.parquet(d).count() == grown.count()
