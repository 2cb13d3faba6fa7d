"""Query AST — the retrieve-query DSL of the reference
(``api/query/Query.scala:36-50``: one-key JSON object dispatch;
retrieve set {match_all, bool, dis_max, match, multi_match, knn, semantic}
plus the rerank query {rrf}; ``semantic`` embeds the query text with the
Searcher's pluggable embedder (deterministic feature-hash by default, ONNX
on a real deployment) and then runs knn; ``knn`` takes a pre-embedded
query vector directly. Both fuse under ``rrf`` for hybrid
lexical ∥ vector search.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass
class MatchQuery(Query):
    """Reference ``api/query/retrieve/MatchQuery.scala:26-54``: analyze query
    string with the field's analyzer → one term clause per token;
    operator OR→SHOULD (default) / AND→MUST."""

    field: str
    query: str
    operator: str = "or"  # "or" | "and"


@dataclass
class MultiMatchQuery(Query):
    """Reference ``api/query/retrieve/MultiMatchQuery.scala:17-41``:
    best_fields → DisMax(per-field match, tie_breaker);
    most_fields → Bool.should (score sum)."""

    query: str
    fields: list[str] = field(default_factory=list)
    type: str = "best_fields"  # "best_fields" | "most_fields"
    tie_breaker: float = 0.0
    operator: str = "or"


@dataclass
class BoolQuery(Query):
    """Reference ``api/query/retrieve/BoolQuery.scala:15-57``; ≥1 clause
    required. Scoring: sum of matching must+should scores; must_not filters."""

    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)


@dataclass
class DisMaxQuery(Query):
    """Reference ``api/query/retrieve/DisMaxQuery.scala:14-41``: max of
    branch scores + tie_breaker * sum(other scores); ≥2 queries."""

    queries: list = field(default_factory=list)
    tie_breaker: float = 0.0


@dataclass
class MatchAllQuery(Query):
    """Reference ``api/query/retrieve/MatchAllQuery.scala:13-21``:
    constant score 1.0 over all docs; the default for an empty body."""


MAX_NUM_CANDIDATES = 10000  # reference KnnQuery.scala:72


@dataclass
class KnnQuery(Query):
    """Reference ``api/query/retrieve/KnnQuery.scala:20-88``: vector top-k
    over a pre-embedded query vector. ``k`` defaults to 10; the candidate
    pool is ``final_k = max(k, num_candidates or round(1.5k))``; request
    filters apply as a PRE-filter (Lucene KnnFloatVectorQuery's filter arg),
    so the k survivors all satisfy the filter. Score = Lucene
    VectorSimilarityFunction.COSINE: (1 + cosine) / 2. A nested
    (array-of-vectors) field scores max-over-children per parent doc —
    DiversifyingChildrenFloatKnnVectorQuery (KnnQuery.scala:42-58)."""

    field: str
    query_vector: list = field(default_factory=list)
    k: int | None = None
    num_candidates: int | None = None

    @property
    def final_k(self) -> int:
        real_k = self.k if self.k is not None else 10
        num_cand = (
            self.num_candidates
            if self.num_candidates is not None
            else int(round(real_k * 1.5))
        )
        return max(real_k, num_cand)


@dataclass
class SemanticQuery(Query):
    """Reference ``api/query/retrieve/SemanticQuery.scala:16-38``: embed the
    query TEXT with the field's model, then run knn. The embedding call is
    the Searcher's pluggable ``embedder`` (default: the deterministic
    feature-hash embedder in ``nixiesearch_spark.embed`` — an ONNX session
    plugs in there on a real deployment). k/num_candidates policy lives on
    the KnnQuery this converts into (engine._embed_semantic); ``model`` is
    passed to the embedder."""

    field: str
    query: str = ""
    k: int | None = None
    num_candidates: int | None = None
    model: str | None = None


@dataclass
class RRFQuery(Query):
    """Reference ``api/query/rerank/RRFQuery.scala:23-79``: retrieve each
    branch's top ``rank_window_size`` (default = request size), fuse with
    Σ 1/(k + rank), rank 0-based, k=60 default; a single branch passes
    through with its RAW scores (combine's head::Nil case). Top-level only;
    sort is rejected under RRF (Searcher.scala:119)."""

    retrieve: list = field(default_factory=list)
    k: float = 60.0
    rank_window_size: int | None = None


def parse_query(obj: dict | None) -> Query:
    """One-key JSON object → Query (reference Query.scala dispatch).
    Empty/None → match_all (reference api/SearchRoute.scala:79-81)."""
    if not obj:
        return MatchAllQuery()
    if len(obj) != 1:
        raise ValueError(f"query object must have exactly one key, got {list(obj)}")
    kind, body = next(iter(obj.items()))
    if kind == "match_all":
        return MatchAllQuery()
    if kind == "match":
        # {"match": {"field": "query text"}} or {"match": {"field": {...}}}
        fld, spec = next(iter(body.items()))
        if isinstance(spec, str):
            return MatchQuery(field=fld, query=spec)
        return MatchQuery(field=fld, query=spec["query"], operator=spec.get("operator", "or"))
    if kind == "multi_match":
        return MultiMatchQuery(
            query=body["query"],
            fields=list(body["fields"]),
            type=body.get("type", "best_fields"),
            tie_breaker=float(body.get("tie_breaker", 0.0)),
            operator=body.get("operator", "or"),
        )
    if kind == "bool":
        return BoolQuery(
            must=[parse_query(q) for q in body.get("must", [])],
            should=[parse_query(q) for q in body.get("should", [])],
            must_not=[parse_query(q) for q in body.get("must_not", [])],
        )
    if kind == "dis_max":
        return DisMaxQuery(
            queries=[parse_query(q) for q in body["queries"]],
            tie_breaker=float(body.get("tie_breaker", 0.0)),
        )
    if kind in ("knn", "semantic"):
        nc = body.get("num_candidates")
        if nc is not None and int(nc) > MAX_NUM_CANDIDATES:
            raise ValueError(
                f"num_candidates should be less than {MAX_NUM_CANDIDATES}"
            )
        kk = int(body["k"]) if body.get("k") is not None else None
        if kind == "knn":
            return KnnQuery(
                field=body["field"],
                query_vector=[float(x) for x in body["query_vector"]],
                k=kk,
                num_candidates=int(nc) if nc is not None else None,
            )
        return SemanticQuery(
            field=body["field"],
            query=str(body["query"]),
            k=kk,
            num_candidates=int(nc) if nc is not None else None,
            model=body.get("model"),
        )
    if kind == "rrf":
        return RRFQuery(
            retrieve=[parse_query(q) for q in body["retrieve"]],
            k=float(body.get("k", 60.0)),
            rank_window_size=(
                int(body["rank_window_size"])
                if body.get("rank_window_size") is not None
                else None
            ),
        )
    raise ValueError(f"unsupported query kind: {kind}")
