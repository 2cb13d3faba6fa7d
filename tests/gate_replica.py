"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB, compare row-count + schema + values
(order-insensitive, column-name-sorted) — run manually:

    python tests/gate_replica.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def compare(name, sdf, osql, con) -> str:
    import math

    spd = sdf.toPandas()
    opd = con.sql(osql).df()
    if sorted(spd.columns) != sorted(opd.columns):
        return f"SCHEMA: spark={sorted(spd.columns)} duck={sorted(opd.columns)}"
    if len(spd) != len(opd):
        return f"ROWS: spark={len(spd)} duck={len(opd)}"
    cols = sorted(spd.columns)
    a = spd[cols].sort_values(cols).reset_index(drop=True)
    b = opd[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                import struct as _st
                if xn != yn or (not (xn and yn) and _st.pack('d', float(x)) != _st.pack('d', float(y))):
                    return f"VALUE col={c} row={i}: spark={x!r} duck={y!r}"
            elif str(x) != str(y):
                return f"VALUE col={c} row={i}: spark={x!r} duck={y!r}"
    return "OK"


def main():
    # default = the driver's contractual gate scale (sf0.01) — the
    # ann_ivf_topk oracle bakes centroids from that corpus
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import duckdb

    import __spark_entry__ as entry
    from nixiesearch_spark.session import get_spark

    spark = get_spark("gate-replica", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = entry.queries(), entry.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            if name not in os_:
                n = sdf.count()
                print(f"{name:28s} rows-only: {n} rows")
                continue
            res = compare(name, sdf, os_[name], con)
        except Exception as e:
            res = f"ERROR: {type(e).__name__}: {e}"
        flag = "" if res == "OK" else "  <<< FAIL"
        if res != "OK":
            fails += 1
        print(f"{name:28s} {res}{flag}")
    print("entry():", entry.entry(spark).count(), "rows")
    print("FAILS:", fails)
    spark.stop()


if __name__ == "__main__":
    main()
