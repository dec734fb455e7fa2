"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and an order-insensitive value hash.

Usage:
  python tools/check_oracles.py [query ...]     # subset (or all fast)
  python tools/check_oracles.py --all           # include BENCH_SCALE set
  python tools/check_oracles.py --all --json CORRECTNESS_full_rNN.json

Rows-only queries (no oracle_sql entry — streaming/iterative/ANN by
design) are recorded with err="no_oracle" and their row count, the r3
driver-artifact format, so every registered query has a per-round status
(VERDICT r4 "gate-coverage rotation" item).

Queries in driver_queries.BENCH_SCALE (multi-ten-second synthetic-scale
builds, e.g. the n=20000 LSH linkage gate) are skipped unless named
explicitly or --all is passed — they are pytest-gated separately and
would dominate this otherwise ~2 min sf0.01 sweep.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from kiez_spark.driver_queries import BENCH_SCALE  # noqa: E402
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
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    run_all = "--all" in args
    args = [a for a in args if a != "--all"]
    only = set(args)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if not only and not run_all and name in BENCH_SCALE:
            print(f"SKIP {name}: bench-scale (run with --all or by name)")
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
        except Exception as ex:
            rec["err"] = f"spark:{type(ex).__name__}"
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            rec["wall_sec"] = round(time.time() - t0, 2)
            print(f"ROWS {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as ex:
            rec["err"] = "duckdb"
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            n_fail += 1
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        sh = table_hash([c.lower() for c in scols], [tuple(r) for r in srows])
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        rec.update(rows_match=ok_rows, schema_match=ok_cols, hash_match=ok_hash)
        rec["wall_sec"] = round(time.time() - t0, 2)
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
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_path} ({len(report)} entries)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
