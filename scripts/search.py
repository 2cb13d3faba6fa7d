"""spark-submit job: run a JSON DSL query against an index.

    spark-submit --py-files nixiesearch_spark.zip scripts/search.py \
        --index /path/index --query '{"match": {"content": "spark join"}}' \
        [--filters '{"term": {"lang": "en"}}'] [--size 10] [--wand]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", default=None, help="JSON query DSL; empty = match_all")
    p.add_argument("--filters", default=None)
    p.add_argument("--size", type=int, default=10)
    p.add_argument("--fields", default=None, help="comma-separated stored fields to fetch")
    p.add_argument("--wand", action="store_true", help="serve a match query via block-max WAND")
    args = p.parse_args()

    from nixiesearch_spark.index import IndexReader
    from nixiesearch_spark.query import Searcher, parse_query
    from nixiesearch_spark.query.wand import wand_topk

    # get_spark is a no-op config-wise under spark-submit (an existing
    # session wins); run locally it sizes the JVM for the build workload
    # instead of the 1g default heap
    from nixiesearch_spark.session import get_spark

    spark = get_spark("nixiesearch-search")
    reader = IndexReader(spark, args.index)
    q = json.loads(args.query) if args.query else None
    if args.wand:
        kind, body = next(iter(q.items()))
        assert kind == "match", "--wand serves match queries"
        fld, spec = next(iter(body.items()))
        text = spec if isinstance(spec, str) else spec["query"]
        out = wand_topk(reader, fld, text, k=args.size)
    else:
        out = Searcher(reader).search(
            q,
            filters=json.loads(args.filters) if args.filters else None,
            size=args.size,
            fields=args.fields.split(",") if args.fields else None,
        )
    for row in out.collect():
        print(json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()
