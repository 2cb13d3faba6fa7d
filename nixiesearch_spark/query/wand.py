"""Block-max WAND top-k over packed VByte postings.

The reference gets top-k pruning from Lucene's
``TopScoreDocCollectorManager(size, size)`` — totalHitsThreshold=size enables
block-max WAND/MAXSCORE skipping inside Lucene
(``api/query/retrieve/RetrieveQuery.scala:80-81``). Catalyst has no analog,
so this is the one genuinely custom physical operator (SURVEY.md §4):

Distributed shape
-----------------
Shards hold disjoint document sets with complete postings (built that way —
``index/builder.py``), so each shard computes an exact local top-k
independently (the classic document-partitioned search fan-out; a shard ≡ a
Lucene segment searched by the reference's work-stealing pool,
``index/Searcher.scala:313``). Global answer = union of per-shard top-ks →
``orderBy(score desc, docid asc).limit(k)`` — k rows per shard cross the
wire, nothing else.

Per-shard algorithm (vectorized block-max pruning + heap-style threshold)
-------------------------------------------------------------------------
1. Blocks of each query term cover disjoint ascending docid ranges; their
   stored ``max_impact`` (idf-free float32 impact bound) gives a per-block
   score upper bound ``ub = mult · weight · max_impact`` (+2 ulp slack so
   float32 rounding can never break soundness).
2. The shard's docid space is cut into stripes; stripe upper bound =
   Σ_terms max(ub of term-blocks overlapping the stripe) — exactly the
   block-max bound, since a doc meets ≤1 block per term.
3. Stripes are processed in DESCENDING ub order, keeping a running top-k
   (θ = k-th best score so far, the heap threshold). As soon as
   ub(stripe) < θ, every remaining stripe — and every document in it — is
   provably non-competitive and is skipped without decoding a single block.
4. Inside a processed stripe, overlapping blocks are VByte-decoded (numpy)
   and scored exactly with the same float32 Lucene op chain as the flat
   path, so WAND results are bit-identical to the exhaustive plan.

Skip test uses strict ``<`` so score==θ docs still surface for the
docid-asc tiebreak (Lucene competitive-iff-equal-and-lower-docid rule).

Filters and tombstones ride INSIDE the pruned search (the analog of
Lucene's Occur.FILTER clause leapfrog, reference
``api/query/retrieve/RetrieveQuery.scala:42-57``): the filter predicate
resolves against the docs table to a per-shard allowed-ordinal set (docs
carry shard+ordinal columns — no join), which is unioned into the same
explicit-repartition exchange as the packed blocks and applied as a
vectorized membership mask at block-decode time. Upper bounds stay sound
(a filter only removes candidates), so filtered WAND results are
bit-identical to the flat filtered path. Tombstones become a banned-ordinal
set the same way. Intended for SELECTIVE filters — a filter matching most
of the corpus ships ~matching-ordinals×8B through the exchange, and the
flat Catalyst path is the better plan there (same answer either way).

Scope: OR and AND match, quantized indexes; parity verified in
tests/test_wand.py.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nixiesearch_spark import lucene
from nixiesearch_spark.analysis import analyzer_py
from nixiesearch_spark.index import codec
from nixiesearch_spark.index.builder import IndexReader

# Python workers must run the pack/WAND closures even when this package is
# not on the executors' import path (e.g. a host-created SparkSession with a
# different cwd): serialize our numeric modules by VALUE into the closures.
try:
    from pyspark import cloudpickle as _cp

    from nixiesearch_spark import lucene as _l
    from nixiesearch_spark.index import codec as _c

    _cp.register_pickle_by_value(_c)
    _cp.register_pickle_by_value(_l)
except Exception:  # pragma: no cover - best effort on older pyspark
    pass

TOPK_SCHEMA = "shard int, ordinal long, score float"
FINAL_SCHEMA = "docid long, score float"
UB_SLACK = np.float64(1.0 + 2.0 ** -21)  # 2 ulps of float32


def _shard_topk(
    pdf: pd.DataFrame,
    weights: dict[str, float],
    mults: dict[str, int],
    cache: np.ndarray,
    k: int,
    n_stripes: int,
    n_required: int = 0,  # >0 → AND semantics: doc must match all n terms
    allow: np.ndarray | None = None,  # sorted allowed ordinals (filter mode)
    ban: np.ndarray | None = None,  # sorted banned ordinals (tombstones)
    bound_scale: float = 1.0,  # ≥1: avgdl-drift correction (see wand_topk)
) -> pd.DataFrame:
    shard = int(pdf["shard"].iloc[0])
    terms = list(dict.fromkeys(pdf["term"]))
    blocks: dict[str, dict] = {}
    lo, hi = np.iinfo(np.int64).max, np.iinfo(np.int64).min
    by_term = {t: g for t, g in pdf.groupby("term", sort=False)}
    for t in terms:
        tdf = by_term[t].sort_values("block_id")
        first = tdf["block_id"].to_numpy(dtype=np.int64)
        last = tdf["block_last"].to_numpy(dtype=np.int64)
        ub = (
            np.float64(mults[t])
            * np.float64(weights[t])
            * tdf["max_impact"].to_numpy(dtype=np.float64)
            * UB_SLACK
            * np.float64(bound_scale)
        )
        blocks[t] = {
            "first": first,
            "last": last,
            "ub": ub,
            "gaps": tdf["doc_gaps"].tolist(),
            "tfs": tdf["tfs"].tolist(),
            "norms": tdf["norms"].tolist(),
        }
        lo = min(lo, int(first[0]))
        hi = max(hi, int(last[-1]))
    if lo > hi:
        return pd.DataFrame({"shard": [], "ordinal": [], "score": []}).astype(
            {"shard": "int32", "ordinal": "int64", "score": "float32"}
        )

    # few blocks → stripe bookkeeping costs more python than it saves in
    # decode: collapse to one stripe (decode-all). Same math, same results.
    if sum(len(b["first"]) for b in blocks.values()) <= 2 * n_stripes:
        n_stripes = 1
    edges = np.linspace(np.float64(lo), np.float64(hi) + 1.0, n_stripes + 1)
    stripe_lo = edges[:-1].astype(np.int64)
    # float64 rounding near ±2^63 can push the first edge above the smallest
    # docid — clamp the outer stripes to cover the whole int64 space
    stripe_lo[0] = np.iinfo(np.int64).min
    stripe_hi = np.empty(n_stripes, dtype=np.int64)
    stripe_hi[:-1] = stripe_lo[1:] - 1
    stripe_hi[-1] = np.iinfo(np.int64).max

    # stripe ub = Σ_t max(ub of blocks overlapping stripe); the stripe
    # range of every block comes from ONE batched searchsorted per term
    stripe_ub = np.zeros(n_stripes, dtype=np.float64)
    overlap: list[list[tuple[str, int]]] = [[] for _ in range(n_stripes)]
    for t in terms:
        b = blocks[t]
        s0a = np.maximum(
            np.searchsorted(stripe_lo, b["first"], side="right") - 1, 0
        )
        s1a = np.minimum(
            np.searchsorted(stripe_lo, b["last"], side="right") - 1, n_stripes - 1
        )
        tmax = np.zeros(n_stripes, dtype=np.float64)
        ubs = b["ub"]
        for j, (a0, a1) in enumerate(zip(s0a, s1a)):
            for s in range(a0, a1 + 1):
                overlap[s].append((t, j))
            tmax[a0 : a1 + 1] = np.maximum(tmax[a0 : a1 + 1], ubs[j])
        stripe_ub += tmax

    order = np.argsort(-stripe_ub, kind="stable")
    top_docs = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float32)
    theta = -np.inf
    decoded: dict[tuple[str, int], tuple] = {}
    for s in order:
        if stripe_ub[s] < theta:
            break  # every remaining stripe is below threshold — pruned
        if not overlap[s]:
            continue
        doc_parts, contrib_parts = [], []
        todo = sorted(set(overlap[s]))  # deterministic accumulation order
        pending: dict[str, list[int]] = {}
        for t, j in todo:
            if (t, j) not in decoded:
                pending.setdefault(t, []).append(j)
        for t, js in pending.items():
            # ONE VByte pass decodes all of this term's new blocks for the
            # stripe (batch decode identity unit-tested); laziness is kept
            # — blocks of pruned stripes are never touched
            b = blocks[t]
            counts = np.array([len(b["norms"][j]) for j in js], dtype=np.int64)
            dv, tfv, nmv = codec.decode_posting_blocks(
                [b["gaps"][j] for j in js],
                [b["tfs"][j] for j in js],
                [b["norms"][j] for j in js],
                counts,
            )
            bounds = np.concatenate([[0], np.cumsum(counts)])
            w = np.float32(weights[t])
            mult = np.float64(mults[t])
            for i, j in enumerate(js):
                d = dv[bounds[i] : bounds[i + 1]]
                tf = tfv[bounds[i] : bounds[i + 1]]
                nm = nmv[bounds[i] : bounds[i + 1]]
                # filter/tombstone mask at decode time, cached with the
                # block (membership by binary search on the sorted sets)
                if allow is not None:
                    if len(allow) == 0:
                        keep = np.zeros(len(d), dtype=bool)
                    else:
                        pos = np.searchsorted(allow, d)
                        keep = (pos < len(allow)) & (
                            allow[np.minimum(pos, len(allow) - 1)] == d
                        )
                    d, tf, nm = d[keep], tf[keep], nm[keep]
                if ban is not None and len(ban):
                    pos = np.searchsorted(ban, d)
                    hit = (pos < len(ban)) & (ban[np.minimum(pos, len(ban) - 1)] == d)
                    d, tf, nm = d[~hit], tf[~hit], nm[~hit]
                c = lucene.bm25_contrib(w, tf.astype(np.float32), nm, cache)
                decoded[(t, j)] = (d, mult * c.astype(np.float64))
        for (t, j) in todo:
            d, c = decoded[(t, j)]
            mask = (d >= stripe_lo[s]) & (d <= stripe_hi[s])
            if mask.any():
                doc_parts.append(d[mask])
                contrib_parts.append(c[mask])
        if not doc_parts:
            continue
        docs = np.concatenate(doc_parts)
        contribs = np.concatenate(contrib_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, contribs)
        if n_required:
            nterms = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(nterms, inv, 1)
            keep = nterms >= n_required
            uniq, sums = uniq[keep], sums[keep]
            if not len(uniq):
                continue
        scores = sums.astype(np.float32)
        # merge with running top-k (stripes hold disjoint docs — pure concat).
        # Boundary ties at the k-th score are RETAINED (capped): ordinals
        # follow docid order within a single batch build, but after
        # incremental appends they may not, and the global docid-asc
        # tiebreak happens after the docid join — so every tied candidate
        # must survive the local cut.
        top_docs = np.concatenate([top_docs, uniq])
        top_scores = np.concatenate([top_scores, scores])
        if len(top_docs) > k:
            order_sel = np.lexsort((top_docs, -top_scores.astype(np.float64)))
            kth = top_scores[order_sel[k - 1]]
            keep_n = int(np.sum(top_scores >= kth))
            keep_n = min(max(keep_n, k), k + 4096)
            sel = order_sel[:keep_n]
            top_docs, top_scores = top_docs[sel], top_scores[sel]
        if len(top_docs) >= k:
            theta = float(np.sort(top_scores)[::-1][k - 1])
    return pd.DataFrame(
        {"shard": np.full(len(top_docs), shard, dtype=np.int32),
         "ordinal": top_docs, "score": top_scores}
    )


def packed_ready(reader: IndexReader) -> bool:
    """True when the packed/WAND serving path is usable: quantized index,
    packed table present and not stale vs the flat postings (appends since
    the last pack make WAND silently miss docs — the staleness guard)."""
    if not reader.quantize:
        return False
    import os

    if not os.path.isdir(os.path.join(reader.index_dir, "packed")):
        return False
    if "packed_seqnum" in reader.stats:  # absent = legacy stats (always packed)
        ps = reader.stats["packed_seqnum"]
        if ps is None or ps != reader.stats.get("seqnum"):
            return False
    return True


def _resolve_pairs(reader: IndexReader, cand: pd.DataFrame) -> dict:
    """(shard, ordinal) → docid for a candidate frame. Driver LUT when the
    corpus fits (zero jobs after warmup); above that, pushed point-lookup
    predicates against the ordinal map (parquet row-group pruned)."""
    pairs = [(int(s), int(o)) for s, o in zip(cand["shard"], cand["ordinal"])]
    omap = reader.ordinal_lookup(pairs)
    if omap is None:  # corpus too big for the driver-side map — SQL lookup
        pred = None
        for s, g in cand.groupby("shard", sort=False):
            p = (F.col("shard") == int(s)) & F.col("ordinal").isin(
                [int(x) for x in g["ordinal"]]
            )
            pred = p if pred is None else (pred | p)
        omap = {
            (int(r["shard"]), int(r["ordinal"])): int(r["docid"])
            for r in reader.ordinal_map.where(pred).collect()
        }
    return omap


def _wand_topk_driver(
    reader: IndexReader,
    field: str,
    present: list[str],
    weights: dict,
    mults: dict,
    cache: np.ndarray,
    k: int,
    n_stripes: int,
    n_required: int,
    bound_scale: float,
) -> DataFrame:
    """Search-head WAND: the query's matched blocks come from a direct
    pyarrow read of the packed parquet (row-group pruned on the sorted term
    column — zero Spark jobs, zero plan compiles; IndexReader.fetch_packed
    falls back to one Spark toPandas on non-local storage), the per-shard
    numpy kernel runs in-process, and the ordinal→docid resolve hits the
    driver LUT. Same kernel, same tie semantics → bit-identical to the
    distributed plan."""
    spark = reader.spark
    pdf = reader.fetch_packed(field, present)
    if pdf.empty:
        return spark.createDataFrame([], FINAL_SCHEMA)
    parts = [
        _shard_topk(g, weights, mults, cache, k, n_stripes, n_required, None, None, bound_scale)
        for _, g in pdf.groupby("shard", sort=False)
    ]
    cand = pd.concat(parts, ignore_index=True)
    if not len(cand):
        return spark.createDataFrame([], FINAL_SCHEMA)
    scores = cand["score"].to_numpy()
    # only candidates at or above the global k-th score can reach the top-k
    # (equal scores retained for the docid-asc tiebreak) — resolving just
    # those keeps the ordinal_map filter to a handful of literals
    theta = np.sort(scores)[::-1][min(k, len(scores)) - 1]
    cand = cand[scores >= theta]
    omap = _resolve_pairs(reader, cand)
    rows = sorted(
        (
            (omap[(int(s), int(o))], float(v))
            for s, o, v in zip(cand["shard"], cand["ordinal"], cand["score"])
        ),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    # pandas → Arrow → LocalRelation: ~10x cheaper than the row-list path
    # (which builds an RDD-backed frame whose collect is a full RDD job)
    out = pd.DataFrame(
        {
            "docid": np.array([d for d, _ in rows], dtype=np.int64),
            "score": np.array([v for _, v in rows], dtype=np.float32),
        }
    )
    return spark.createDataFrame(out, FINAL_SCHEMA)


def match_scores_driver(
    reader: IndexReader, field: str, text: str, operator: str = "or"
) -> "pd.DataFrame | None":
    """FULL match-set (docid, score float32) decoded on the search head —
    the driver analog of engine.score() for a match query, feeding facet
    and sort-by-field serving. Reuses _shard_topk with an unreachable k
    (no theta ever set, single stripe → plain decode-all), so the float32
    score chain is the exact WAND/flat chain. Returns None when the packed
    path or the driver ordinal LUT is unavailable (callers fall back to
    the cluster plan); tombstones must be handled by the caller (decline)."""
    if not packed_ready(reader):
        return None
    plan = _match_plan(reader, field, text, operator)
    if plan is None:
        return pd.DataFrame({"docid": np.empty(0, np.int64), "score": np.empty(0, np.float32)})
    pdf = reader.fetch_packed(field, plan["present"])
    if pdf.empty:
        return pd.DataFrame({"docid": np.empty(0, np.int64), "score": np.empty(0, np.float32)})
    parts = [
        _shard_topk(
            g, plan["weights"], plan["mults"], plan["cache"], 1 << 60, 1,
            plan["n_required"], None, None, plan["bound_scale"],
        )
        for _, g in pdf.groupby("shard", sort=False)
    ]
    cand = pd.concat(parts, ignore_index=True)
    if not len(cand):
        return pd.DataFrame({"docid": np.empty(0, np.int64), "score": np.empty(0, np.float32)})
    pairs = [(int(s), int(o)) for s, o in zip(cand["shard"], cand["ordinal"])]
    omap = reader.ordinal_lookup(pairs)
    if omap is None:  # corpus too big for the driver map → cluster plan
        return None
    return pd.DataFrame(
        {
            "docid": np.array([omap[p] for p in pairs], dtype=np.int64),
            "score": cand["score"].to_numpy(np.float32),
        }
    )


def _match_plan(reader: IndexReader, field: str, text: str, operator: str = "or"):
    """Resolve a match query's terms/weights/bounds against the dictionary
    (driver-side, zero jobs on a local index). None = provably-empty query
    (no known terms, or an AND with a missing term)."""
    terms = analyzer_py(reader.field_analyzer(field))(text)
    mult = Counter(terms)
    tstats = reader.term_stats(field, list(mult))
    present = [t for t in mult if t in tstats]
    if not present or (operator == "and" and len(present) < len(mult)):
        return None
    avgdl_now = float(reader.field_stats(field)["avgdl"])
    pack_avgdl = (reader.stats.get("pack_avgdl") or {}).get(field)
    return {
        "field": field,
        "present": present,
        "dfs": {t: int(tstats[t][0]) for t in present},
        "weights": {t: tstats[t][1] for t in present},
        "mults": {t: int(mult[t]) for t in present},
        "n_required": len(present) if operator == "and" else 0,
        # see wand_topk: exact scoring uses avgdl_now; stored block bounds
        # were computed at pack_avgdl and stay sound scaled by the ratio
        "cache": lucene.norm_cache(np.float32(avgdl_now)),
        "bound_scale": max(1.0, avgdl_now / float(pack_avgdl)) if pack_avgdl else 1.0,
    }


def rrf_topk_driver(
    reader: IndexReader,
    branches: list,
    size: int = 10,
    window: int = 100,
    rrf_k: float = 60.0,
    n_stripes: int = 32,
) -> DataFrame:
    """Search-head RRF over match branches (the rrf_fuse semantics of
    query/rrf.py executed entirely on the driver): each branch's top-window
    comes from the same WAND numpy kernel (bit-identical branch scores),
    ranks fuse as Σ 1/(rrf_k + rank) in float64 with the docid-asc tiebreak
    at every cut, and the fused top-``size`` returns as an Arrow
    LocalRelation. Zero Catalyst compiles — this is the serving answer to
    the two-branch plan-compile floor (BENCH.md r3 §1).

    ``branches``: ast.MatchQuery objects or (field, text, operator) tuples.
    Dead branches drop out exactly like rrf_fuse_matches' ``live`` filter;
    results match the on-cluster fused path (tests/test_wand.py parity).
    Requires ``packed_ready(reader)`` — callers route elsewhere when stale.
    """
    spark = reader.spark
    plans = []
    for m in branches:
        field, text, op = (
            (m.field, m.query, m.operator) if hasattr(m, "field") else m
        )
        plans.append(_match_plan(reader, field, text, op))
    live = [p for p in plans if p is not None]
    empty = spark.createDataFrame([], "docid long, score double")
    if not live:
        return empty
    by_field: dict[str, set] = {}
    for p in live:
        by_field.setdefault(p["field"], set()).update(p["present"])
    fetched = {f: reader.fetch_packed(f, sorted(ts)) for f, ts in by_field.items()}
    branch_cands = []
    for p in live:
        pdf = fetched[p["field"]]
        pdf = pdf[pdf["term"].isin(p["present"])]
        if pdf.empty:
            branch_cands.append(None)
            continue
        parts = [
            _shard_topk(
                g, p["weights"], p["mults"], p["cache"], window, n_stripes,
                p["n_required"], None, None, p["bound_scale"],
            )
            for _, g in pdf.groupby("shard", sort=False)
        ]
        cand = pd.concat(parts, ignore_index=True)
        branch_cands.append(cand if len(cand) else None)
    present_cands = [c for c in branch_cands if c is not None]
    if not present_cands:
        return empty
    cat = pd.concat(present_cands, ignore_index=True)
    omap = _resolve_pairs(reader, cat.drop_duplicates(["shard", "ordinal"]))
    fused: dict[int, float] = {}
    for c in branch_cands:
        if c is None:
            continue
        docids = np.array(
            [omap[(int(s), int(o))] for s, o in zip(c["shard"], c["ordinal"])],
            dtype=np.int64,
        )
        scores = c["score"].to_numpy()
        # branch rank = position under (score desc, docid asc) — the same
        # total order rrf_fuse's orderBy().limit(window) applies
        order = np.lexsort((docids, -scores.astype(np.float64)))[:window]
        for rank, idx in enumerate(order):
            d = int(docids[idx])
            fused[d] = fused.get(d, 0.0) + 1.0 / (float(rrf_k) + rank)
    rows = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:size]
    out = pd.DataFrame(
        {
            "docid": np.array([d for d, _ in rows], dtype=np.int64),
            "score": np.array([v for _, v in rows], dtype=np.float64),
        }
    )
    return spark.createDataFrame(out, "docid long, score double")


def _shard_bool_topk(
    pdf: pd.DataFrame,
    plans: list,
    kind: str,
    tie: float,
    k: int,
    n_stripes: int,
) -> pd.DataFrame:
    """Per-shard block-max pruned top-k for a FUSED bool/dis_max of match
    branches — the multi-branch generalization of _shard_topk, replicating
    engine._fused's quantized float chain exactly: per-branch sums are
    float64 accumulations of float32 contribs cast to float32, combined in
    float64 (must+matching-should sum, or max + tie·rest), final float32.

    ``plans``: per-branch dicts from _match_plan + {"role"}; must_not
    branches contribute no upper bound (exclusion only removes). Stripe
    ub = Σ over positive branches of Σ_terms max block ub — sound for the
    bool sum, and for dis_max with tie ≤ 1."""
    shard = int(pdf["shard"].iloc[0])
    empty = pd.DataFrame({"shard": [], "ordinal": [], "score": []}).astype(
        {"shard": "int32", "ordinal": "int64", "score": "float32"}
    )
    # blocks per (branch, term): branches may share surface terms but carry
    # their own weights/mults
    binfo: list[dict] = []
    lo, hi = np.iinfo(np.int64).max, np.iinfo(np.int64).min
    for bi, p in enumerate(plans):
        fpdf = pdf[(pdf["field"] == p["field"]) & pdf["term"].isin(p["present"])]
        terms = list(dict.fromkeys(fpdf["term"]))
        by_term = {t: g for t, g in fpdf.groupby("term", sort=False)}
        blocks = {}
        for t in terms:
            tdf = by_term[t].sort_values("block_id")
            first = tdf["block_id"].to_numpy(dtype=np.int64)
            last = tdf["block_last"].to_numpy(dtype=np.int64)
            ub = (
                np.float64(p["mults"][t])
                * np.float64(p["weights"][t])
                * tdf["max_impact"].to_numpy(dtype=np.float64)
                * UB_SLACK
                * np.float64(p["bound_scale"])
            )
            blocks[t] = {
                "first": first, "last": last, "ub": ub,
                "gaps": tdf["doc_gaps"].tolist(), "tfs": tdf["tfs"].tolist(),
                "norms": tdf["norms"].tolist(),
            }
            if p["role"] != "must_not":
                lo = min(lo, int(first[0]))
                hi = max(hi, int(last[-1]))
        binfo.append({"plan": p, "blocks": blocks})
    if lo > hi:
        return empty
    if sum(len(b["first"]) for info in binfo for b in info["blocks"].values()) <= 2 * n_stripes:
        n_stripes = 1
    edges = np.linspace(np.float64(lo), np.float64(hi) + 1.0, n_stripes + 1)
    stripe_lo = edges[:-1].astype(np.int64)
    stripe_lo[0] = np.iinfo(np.int64).min
    stripe_hi = np.empty(n_stripes, dtype=np.int64)
    stripe_hi[:-1] = stripe_lo[1:] - 1
    stripe_hi[-1] = np.iinfo(np.int64).max

    stripe_ub = np.zeros(n_stripes, dtype=np.float64)
    overlap: list[list[tuple[int, str, int]]] = [[] for _ in range(n_stripes)]
    for bi, info in enumerate(binfo):
        positive = info["plan"]["role"] != "must_not"
        for t, b in info["blocks"].items():
            tmax = np.zeros(n_stripes, dtype=np.float64)
            s0a = np.maximum(
                np.searchsorted(stripe_lo, b["first"], side="right") - 1, 0
            )
            s1a = np.minimum(
                np.searchsorted(stripe_lo, b["last"], side="right") - 1,
                n_stripes - 1,
            )
            ubs = b["ub"]
            for j, (a0, a1) in enumerate(zip(s0a, s1a)):
                for s in range(a0, a1 + 1):
                    overlap[s].append((bi, t, j))
                if positive:
                    tmax[a0 : a1 + 1] = np.maximum(tmax[a0 : a1 + 1], ubs[j])
            stripe_ub += tmax

    musts = [i for i, x in enumerate(binfo) if x["plan"]["role"] == "must"]
    shoulds = [i for i, x in enumerate(binfo) if x["plan"]["role"] == "should"]
    nots = [i for i, x in enumerate(binfo) if x["plan"]["role"] == "must_not"]
    dis = [i for i, x in enumerate(binfo) if x["plan"]["role"] == "dismax"]

    order = np.argsort(-stripe_ub, kind="stable")
    top_docs = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float32)
    theta = -np.inf
    decoded: dict[tuple[int, str, int], tuple] = {}
    for s in order:
        if stripe_ub[s] < theta:
            break
        if not overlap[s]:
            continue
        # per-branch per-doc sums + term counts within this stripe
        per_branch: dict[int, tuple] = {}
        by_branch_docs: dict[int, list] = {}
        by_branch_contribs: dict[int, list] = {}
        todo = sorted(set(overlap[s]))  # deterministic accumulation order
        pending: dict[tuple[int, str], list[int]] = {}
        for bi, t, j in todo:
            if (bi, t, j) not in decoded:
                pending.setdefault((bi, t), []).append(j)
        for (bi, t), js in pending.items():
            # batch VByte decode per (branch, term) — same identity-tested
            # kernel as _shard_topk's stripe decode
            info = binfo[bi]
            b = info["blocks"][t]
            p = info["plan"]
            counts_b = np.array([len(b["norms"][j]) for j in js], dtype=np.int64)
            dv, tfv, nmv = codec.decode_posting_blocks(
                [b["gaps"][j] for j in js],
                [b["tfs"][j] for j in js],
                [b["norms"][j] for j in js],
                counts_b,
            )
            bounds = np.concatenate([[0], np.cumsum(counts_b)])
            w = np.float32(p["weights"][t])
            mult = np.float64(p["mults"][t])
            for i, j in enumerate(js):
                d = dv[bounds[i] : bounds[i + 1]]
                tf = tfv[bounds[i] : bounds[i + 1]]
                nm = nmv[bounds[i] : bounds[i + 1]]
                c = lucene.bm25_contrib(w, tf.astype(np.float32), nm, p["cache"])
                decoded[(bi, t, j)] = (d, mult * c.astype(np.float64))
        for (bi, t, j) in todo:
            d, c = decoded[(bi, t, j)]
            mask = (d >= stripe_lo[s]) & (d <= stripe_hi[s])
            if mask.any():
                by_branch_docs.setdefault(bi, []).append(d[mask])
                by_branch_contribs.setdefault(bi, []).append(c[mask])
        if not any(bi in by_branch_docs for bi in (musts + shoulds + dis)):
            continue
        # union of positive docs in this stripe (must_not-only docs never score)
        pos_docs = np.concatenate(
            [x for bi in (musts + shoulds + dis) for x in by_branch_docs.get(bi, [])]
        )
        uniq = np.unique(pos_docs)
        nb = len(binfo)
        sums32 = np.zeros((nb, len(uniq)), dtype=np.float32)
        counts = np.zeros((nb, len(uniq)), dtype=np.int64)
        for bi in range(nb):
            if bi not in by_branch_docs:
                continue
            d = np.concatenate(by_branch_docs[bi])
            c = np.concatenate(by_branch_contribs[bi])
            pos = np.searchsorted(uniq, d)
            inside = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == d)
            d, c, pos = d[inside], c[inside], pos[inside]
            acc = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(acc, pos, c)
            sums32[bi] = acc.astype(np.float32)
            np.add.at(counts[bi], pos, 1)
        # bool/dismax combination in float64 over the float32 branch sums —
        # the exact engine._fused chain
        if kind == "bool":
            cond = np.ones(len(uniq), dtype=bool)
            for bi in musts:
                need = binfo[bi]["plan"]["n_required"] or 1
                cond &= counts[bi] >= need
            for bi in nots:
                need = binfo[bi]["plan"]["n_required"] or 1
                cond &= counts[bi] < need
            score = np.zeros(len(uniq), dtype=np.float64)
            for bi in musts:
                score += sums32[bi].astype(np.float64)
            ok_any = np.zeros(len(uniq), dtype=bool)
            for bi in shoulds:
                need = binfo[bi]["plan"]["n_required"] or 1
                ok = counts[bi] >= need
                ok_any |= ok
                score += np.where(ok, sums32[bi].astype(np.float64), 0.0)
            if not musts:
                cond &= ok_any
        else:  # dismax
            vals = np.full((len(dis), len(uniq)), -np.inf, dtype=np.float64)
            ok_any = np.zeros(len(uniq), dtype=bool)
            for i, bi in enumerate(dis):
                need = binfo[bi]["plan"]["n_required"] or 1
                ok = counts[bi] >= need
                ok_any |= ok
                vals[i] = np.where(ok, sums32[bi].astype(np.float64), -np.inf)
            cond = ok_any
            mx = vals.max(axis=0)
            total = np.where(vals == -np.inf, 0.0, vals).sum(axis=0)
            score = mx + np.float64(tie) * (total - mx)
        uniq, score = uniq[cond], score[cond]
        if not len(uniq):
            continue
        scores = score.astype(np.float32)
        top_docs = np.concatenate([top_docs, uniq])
        top_scores = np.concatenate([top_scores, scores])
        if len(top_docs) > k:
            order_sel = np.lexsort((top_docs, -top_scores.astype(np.float64)))
            kth = top_scores[order_sel[k - 1]]
            keep_n = int(np.sum(top_scores >= kth))
            keep_n = min(max(keep_n, k), k + 4096)
            sel = order_sel[:keep_n]
            top_docs, top_scores = top_docs[sel], top_scores[sel]
        if len(top_docs) >= k:
            theta = float(np.sort(top_scores)[::-1][k - 1])
    return pd.DataFrame(
        {"shard": np.full(len(top_docs), shard, dtype=np.int32),
         "ordinal": top_docs, "score": top_scores}
    )


def bool_topk_driver(
    reader: IndexReader,
    branches: list,
    k: int = 10,
    kind: str = "bool",
    tie: float = 0.0,
    n_stripes: int = 32,
    driver_max_blocks: int = 20_000,
) -> DataFrame | None:
    """Search-head fused bool/dis_max top-k over match branches —
    bit-identical to engine._fused's flat plan (tests/test_serving.py).
    ``branches``: list of (role, MatchQuery-like). Returns None when this
    physical strategy declines (block volume too large for the driver, or
    dis_max tie > 1 which breaks the Σ-bound soundness) — callers fall
    back to the Catalyst plan."""
    if kind == "dismax" and not (0.0 <= float(tie) <= 1.0):
        return None
    spark = reader.spark
    plans = []
    for role, m in branches:
        p = _match_plan(reader, m.field, m.query, m.operator)
        if p is not None:
            p = dict(p, role=role)
        plans.append((role, p))
    empty = spark.createDataFrame([], FINAL_SCHEMA)
    # dead-branch semantics identical to engine._fused
    if any(role == "must" and p is None for role, p in plans):
        return empty
    live = [p for _, p in plans if p is not None]
    if not any(p["role"] in ("must", "should", "dismax") for p in live):
        return empty
    bs = int(reader.stats.get("block_size", 128))
    nsh_est = int(reader.stats.get("n_shards", 32))
    est_blocks = sum(
        p["dfs"][t] // bs + 1 + nsh_est for p in live for t in p["present"]
    )
    if est_blocks > driver_max_blocks:
        return None
    by_field: dict[str, set] = {}
    for p in live:
        by_field.setdefault(p["field"], set()).update(p["present"])
    # fetch_packed projects the field column away — re-tag per source frame
    pdf = pd.concat(
        [
            reader.fetch_packed(f, sorted(ts)).assign(field=f)
            for f, ts in by_field.items()
        ],
        ignore_index=True,
    )
    if pdf.empty:
        return empty
    parts = [
        _shard_bool_topk(g, live, kind, float(tie), k, n_stripes)
        for _, g in pdf.groupby("shard", sort=False)
    ]
    cand = pd.concat(parts, ignore_index=True)
    if not len(cand):
        return empty
    scores = cand["score"].to_numpy()
    theta = np.sort(scores)[::-1][min(k, len(scores)) - 1]
    cand = cand[scores >= theta]
    omap = _resolve_pairs(reader, cand)
    rows = sorted(
        (
            (omap[(int(s), int(o))], float(v))
            for s, o, v in zip(cand["shard"], cand["ordinal"], cand["score"])
        ),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    out = pd.DataFrame(
        {
            "docid": np.array([d for d, _ in rows], dtype=np.int64),
            "score": np.array([v for _, v in rows], dtype=np.float32),
        }
    )
    return spark.createDataFrame(out, FINAL_SCHEMA)


def wand_topk(
    reader: IndexReader,
    field: str,
    text: str,
    k: int = 10,
    n_stripes: int = 32,
    operator: str = "or",
    resolve: str = "auto",
    filters: dict | None = None,
    mode: str = "auto",
    driver_max_blocks: int = 20_000,
) -> DataFrame:
    """Block-max WAND match top-k over the packed table.
    ``operator="and"`` requires every query term per doc (conjunction is
    applied inside the stripe scorer; the OR upper bounds stay valid).
    ``resolve``: ordinal→docid strategy — "join" | "lookup" | "auto"
    (lookup above 5M docs; see inline rationale).
    ``filters``: same predicate dict as the flat Searcher — applied inside
    the pruned search as an allowed-ordinal mask (module docstring); results
    are bit-identical to ``Searcher.search(..., filters=...)``. Tombstones
    are honored the same way (banned-ordinal set), so a WAND query between
    deletes and the next compaction stays correct.

    ``mode``: physical strategy — "distributed" | "driver" | "auto". The
    driver path is the search-head pattern (the reference's coordinator
    searching Lucene segments in-process): when the dictionary says the
    query's matched blocks are small (Σ df/block_size ≤ driver_max_blocks,
    known BEFORE any job), ONE job collects those blocks from the cached
    packed scan, the same _shard_topk numpy kernel runs per shard on the
    driver, and a second tiny job resolves just the global top-k ordinals.
    That replaces the repartition exchange + python-worker round-trip +
    broadcast-join job (~0.5 s of pure scheduling at any data size) with
    ~2 small jobs. High-df queries — where block volume is real work —
    keep the distributed plan; "auto" also falls back to it whenever a
    filter or tombstones are in play (their ordinal sets belong on the
    cluster). Results are bit-identical across modes (tests/test_wand.py)."""
    if not reader.quantize:
        raise ValueError("WAND serving path requires a quantized index")
    if "packed_seqnum" in reader.stats:  # absent = legacy stats (always packed)
        ps = reader.stats["packed_seqnum"]
        if ps is None or ps != reader.stats.get("seqnum"):
            raise ValueError(
                "packed table is stale (appends since last pack) — run merge()/"
                "compact() or finalize(pack=True); the flat Searcher path is fresh"
            )
    spark = reader.spark
    # _match_plan resolves terms/weights and the avgdl-drift bound_scale
    # (incremental packs keep block max_impact bounds computed at the avgdl
    # of the last FULL pack; BM25 contrib is increasing in avgdl and for
    # a ≤ a' the ratio contrib(a')/contrib(a) ≤ a'/a, so scaling stored
    # bounds by max(1, avgdl_now/pack_avgdl) keeps them sound upper bounds
    # under drift; exact scoring always uses avgdl_now, so results stay
    # bit-identical to the flat path — drift only costs pruning power).
    plan = _match_plan(reader, field, text, operator)
    if plan is None:
        return spark.createDataFrame([], FINAL_SCHEMA)
    present = plan["present"]
    n_required = plan["n_required"]
    weights, mults = plan["weights"], plan["mults"]
    cache, bound_scale = plan["cache"], plan["bound_scale"]

    # resolve filters/tombstones to per-shard ordinal sets (docs rows carry
    # shard + ordinal — a column projection, no join); "allow" mode when a
    # filter is present (tombstones anti-joined in), "ban" mode for
    # tombstones alone (cheaper: ships only deleted ordinals)
    tombs = reader.tombstones
    fmode = 0  # 0 = none, 1 = allow, 2 = ban
    fframe = None
    if filters is not None:
        from nixiesearch_spark.query.filters import compile_predicate

        keep = reader.docs.where(compile_predicate(filters))
        if tombs is not None:
            keep = keep.join(tombs, "docid", "left_anti")
        fframe, fmode = keep.select("shard", "ordinal"), 1
    elif tombs is not None:
        fframe, fmode = (
            reader.docs.join(tombs, "docid", "left_semi").select("shard", "ordinal"),
            2,
        )

    bs = int(reader.stats.get("block_size", 128))
    nsh_est = int(reader.stats.get("n_shards", 32))
    # exact block count upper bound from dictionary df: ceil(df/bs) + one
    # boundary block per (term, shard, ordinal sub-group) — known driver-side
    # with zero jobs
    est_blocks = sum(plan["dfs"][t] // bs + 1 + nsh_est for t in present)
    # filters/tombstones always take the distributed plan (their ordinal
    # sets belong on the cluster) — an explicit mode="driver" is a physical
    # HINT, never a license to drop the masks
    if fframe is None and (
        mode == "driver" or (mode == "auto" and est_blocks <= driver_max_blocks)
    ):
        return _wand_topk_driver(
            reader, field, present, weights, mults, cache, k, n_stripes,
            n_required, bound_scale,
        )

    def run(batches) -> "pd.DataFrame":
        # mapInPandas over an explicit repartition: AQE would coalesce the
        # tiny query-time shuffle into ONE task (serializing all shards into
        # a single python worker); an explicit numPartitions exchange is
        # never coalesced. Batches within a partition may split a shard, so
        # concat first (query-matched blocks are small by construction).
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("shard", sort=False):
            allow = ban = None
            if fmode:
                ords = np.sort(
                    g.loc[g["_f"] != 0, "f_ord"].to_numpy(dtype=np.int64)
                )
                if fmode == 1:
                    allow = ords
                elif len(ords):
                    ban = ords
                g = g[g["_f"] == 0]
                if not len(g) or (fmode == 1 and not len(allow)):
                    continue
            yield _shard_topk(
                g, weights, mults, cache, k, n_stripes, n_required, allow, ban,
                bound_scale,
            )

    matched = reader.packed.where(
        (F.col("field") == field) & F.col("term").isin(present)
    ).select(
        "shard", "term", "block_id", "block_last", "doc_gaps", "tfs", "norms", "max_impact"
    )
    if fmode:
        # union the ordinal set into the SAME exchange as the packed blocks
        # (one shuffle, co-located by shard; no cogroup — grouped applyInPandas
        # would hand AQE a coalescible shuffle again)
        matched = matched.withColumn("_f", F.lit(0).cast("int")).withColumn(
            "f_ord", F.lit(None).cast("long")
        )
        fpad = fframe.select(
            "shard",
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("long").alias("block_id"),
            F.lit(None).cast("long").alias("block_last"),
            F.lit(None).cast("binary").alias("doc_gaps"),
            F.lit(None).cast("binary").alias("tfs"),
            F.lit(None).cast("binary").alias("norms"),
            F.lit(None).cast("float").alias("max_impact"),
            F.lit(fmode).cast("int").alias("_f"),
            F.col("ordinal").alias("f_ord"),
        )
        matched = matched.unionByName(fpad)
    nsh = int(reader.stats.get("n_shards", 32))
    local = matched.repartition(nsh, "shard").mapInPandas(run, schema=TOPK_SCHEMA)
    # map shard-local ordinals back to global docids. Two physical
    # strategies with identical results:
    # - "join": broadcast the tiny candidate frame against the
    #   (shard, ordinal, docid) map — one job, minimal plan, fastest when
    #   the map fits a cached scan (sandbox scale);
    # - "lookup": collect the ≈k-per-shard candidates and fold them into
    #   pushable point predicates (OR of shard = s AND ordinal IN (...))
    #   + a literal score map — at 10^9+ docs the join side would scan the
    #   WHOLE docs-derived map per query, while the predicates prune to a
    #   handful of parquet row-groups (docs are written sorted by
    #   (shard, bucket, docid)). Plan-compile cost of the literals is
    #   ~1 s, noise at that scale.
    doc_count = max(
        (f.get("doc_count", 0) for f in reader.stats.get("fields", {}).values()),
        default=0,
    )
    use_lookup = resolve == "lookup" or (resolve == "auto" and doc_count > 5_000_000)
    if not use_lookup:
        joined = reader.ordinal_map.join(F.broadcast(local), ["shard", "ordinal"])
        return (
            joined.select("docid", "score")
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )
    rows = local.collect()
    if not rows:
        return spark.createDataFrame([], FINAL_SCHEMA)
    by_shard: dict[int, list[int]] = {}
    smap: dict[str, float] = {}
    for r in rows:
        by_shard.setdefault(int(r["shard"]), []).append(int(r["ordinal"]))
        smap[f"{int(r['shard'])}_{int(r['ordinal'])}"] = float(r["score"])
    pred = None
    for s, ords in by_shard.items():
        p = (F.col("shard") == s) & F.col("ordinal").isin(ords)
        pred = p if pred is None else (pred | p)
    score_map = F.create_map(
        *[x for kv in smap.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    key = F.concat_ws("_", F.col("shard"), F.col("ordinal"))
    out = (
        reader.ordinal_map.where(pred)
        .select("docid", score_map[key].cast("float").alias("score"))
    )
    return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)
