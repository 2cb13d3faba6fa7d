"""Serve one or more index dirs over HTTP (the reference's standalone
search/index API; api/*.scala route parity documented in
nixiesearch_spark/api.py).

    python scripts/serve.py --index movies=/path/to/idx \
        [--index docs=/other/idx] [--port 8080] \
        [--writable movies:content]  # enable the REST push source with
                                     # text fields "content" (comma-sep)
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", action="append", required=True,
                   metavar="NAME=DIR", help="serve DIR as index NAME")
    p.add_argument("--writable", action="append", default=[],
                   metavar="NAME[:FIELDS]",
                   help="enable writes for NAME; shard count / analyzers / "
                        "quantization come from the index's own stats.json "
                        "(FIELDS defaults to the indexed fields)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()

    from nixiesearch_spark.api import SearchServer, config_from_stats
    from nixiesearch_spark.session import get_spark

    dirs = dict(spec.split("=", 1) for spec in args.index)
    writable = {}
    for spec in args.writable:
        name, _, fields = spec.partition(":")
        # the write config MUST agree with the on-disk index (shards,
        # analyzers, quantization) — derive it from stats.json rather than
        # trusting defaults that would silently corrupt appended batches
        writable[name] = config_from_stats(
            dirs[name], text_fields=tuple(fields.split(",")) if fields else None
        )

    spark = get_spark("nixiesearch-serve", serving=True)
    server = SearchServer(spark, host=args.host, port=args.port)
    for name, d in dirs.items():
        server.add_index(name, d, config=writable.get(name))
    print(f"serving {sorted(server.indexes)} on {args.host}:{server.port}")
    server.httpd.serve_forever()


if __name__ == "__main__":
    main()
