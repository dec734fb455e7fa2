"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from kiez_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            n_fail += 1
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        sh = table_hash([c.lower() for c in scols], [tuple(r) for r in srows])
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "PASS" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        detail = ""
        if not ok_cols:
            detail += f" cols spark={scols} duck={dcols}"
        if not ok_rows:
            detail += f" rows spark={len(srows)} duck={len(drows)}"
        if ok_cols and ok_rows and not ok_hash:
            detail += f" hash {sh} != {dh}"
        print(f"{status} {name}: {len(srows)} rows{detail}")
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
