"""Filter predicates → Catalyst Columns.

Reference ``api/filter/Predicate.scala`` compiles a JSON predicate tree to
Lucene ``Occur.FILTER`` clauses (match, don't score). Here the tree compiles
to a single Column expression over the docs table, so Catalyst pushes it all
the way to the parquet/Iceberg scan (PushedFilters) — the exact analog of
Lucene's non-scoring filter clauses + point-tree pushdown.

Semantics replicated:
- ``term``: exact match (Predicate.scala:127-167); bool as-is, date/datetime
  native types.
- ``range``: gt/gte/lt/lte (Predicate.scala:194-268); open ends unbounded;
  strict bounds are native ``>``/``<`` (no ±1 trick needed — Catalyst has
  real strict comparison; the reference's nextUp/nextDown only exists
  because Lucene point queries are inclusive-only).
- ``and`` / ``or`` / ``not`` (Predicate.scala:48-79).
- ``geo_distance`` (haversine, Predicate.scala:350-360), ``geo_box``
  (Predicate.scala:384-404) — pure Column math, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.7714  # mean radius used by Lucene's haversine (meters)


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def collect_filter_fields(spec: dict) -> list[str]:
    """Field names referenced by a predicate tree (for mapping validation)."""
    kind, body = next(iter(spec.items()))
    if kind in ("term", "range"):
        return [next(iter(body))]
    if kind in ("and", "or"):
        return [f for s in body for f in collect_filter_fields(s)]
    if kind == "not":
        inner = body[0] if isinstance(body, list) else body
        return collect_filter_fields(inner)
    if kind in ("geo_distance", "geo_box"):
        return [body["field"]]
    return []


def compile_predicate(spec: dict) -> Column:
    """{"term": {"f": v}} | {"range": {"f": {"gte": ..}}} | {"and": [..]} |
    {"or": [..]} | {"not": ..} | {"geo_distance": {...}} | {"geo_box": {...}}"""
    if len(spec) != 1:
        raise ValueError(f"predicate must have exactly one key: {list(spec)}")
    kind, body = next(iter(spec.items()))
    if kind == "term":
        fld, v = next(iter(body.items()))
        return F.col(fld) == F.lit(v)
    if kind == "range":
        fld, bounds = next(iter(body.items()))
        c = F.lit(True)
        if "gt" in bounds:
            c = c & (F.col(fld) > F.lit(bounds["gt"]))
        if "gte" in bounds:
            c = c & (F.col(fld) >= F.lit(bounds["gte"]))
        if "lt" in bounds:
            c = c & (F.col(fld) < F.lit(bounds["lt"]))
        if "lte" in bounds:
            c = c & (F.col(fld) <= F.lit(bounds["lte"]))
        return c
    if kind == "and":
        out = compile_predicate(body[0])
        for s in body[1:]:
            out = out & compile_predicate(s)
        return out
    if kind == "or":
        out = compile_predicate(body[0])
        for s in body[1:]:
            out = out | compile_predicate(s)
        return out
    if kind == "not":
        # Lucene MUST_NOT beside MatchAllDocs KEEPS docs missing the field;
        # plain SQL ~pred is NULL there (row dropped) — coalesce to True so
        # null-field docs survive negation (Predicate.scala:48-79 parity)
        inner = body[0] if isinstance(body, list) else body
        return F.coalesce(~compile_predicate(inner), F.lit(True))
    if kind == "geo_distance":
        # {"field": "loc", "lat": .., "lon": .., "distance_m": ..}
        f = body["field"]
        return (
            haversine_meters(
                F.col(f + ".lat"), F.col(f + ".lon"), F.lit(body["lat"]), F.lit(body["lon"])
            )
            <= F.lit(float(body["distance_m"]))
        )
    if kind == "geo_box":
        # {"field": "loc", "top_left": {...}, "bottom_right": {...}}
        f = body["field"]
        tl, br = body["top_left"], body["bottom_right"]
        return (
            (F.col(f + ".lat") <= F.lit(tl["lat"]))
            & (F.col(f + ".lat") >= F.lit(br["lat"]))
            & (F.col(f + ".lon") >= F.lit(tl["lon"]))
            & (F.col(f + ".lon") <= F.lit(br["lon"]))
        )
    raise ValueError(f"unsupported predicate kind: {kind}")
