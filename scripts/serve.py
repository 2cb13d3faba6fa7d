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
                   metavar="NAME:FIELDS",
                   help="enable writes for NAME with comma-sep text fields")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()

    from nixiesearch_spark.api import SearchServer
    from nixiesearch_spark.index import IndexConfig
    from nixiesearch_spark.session import get_spark

    writable = {}
    for spec in args.writable:
        name, fields = spec.split(":", 1)
        writable[name] = IndexConfig(text_fields=tuple(fields.split(",")))

    spark = get_spark("nixiesearch-serve", serving=True)
    server = SearchServer(spark, host=args.host, port=args.port)
    for spec in args.index:
        name, d = spec.split("=", 1)
        server.add_index(name, d, config=writable.get(name))
    print(f"serving {sorted(server.indexes)} on {args.host}:{server.port}")
    server.httpd.serve_forever()


if __name__ == "__main__":
    main()
