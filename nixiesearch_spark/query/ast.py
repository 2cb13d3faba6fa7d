"""Query AST — the retrieve-query DSL of the reference
(``api/query/Query.scala:36-50``: one-key JSON object dispatch;
retrieve set {match_all, bool, dis_max, match, multi_match, knn, semantic} —
knn/semantic are out of v1 scope, documented parity gap).
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
    raise ValueError(f"unsupported query kind: {kind}")
