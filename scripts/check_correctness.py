"""Local emulation of the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` twin side-by-side at sf0.01
(Spark vs DuckDB over the same parquet tables) and compare row count,
column names, and a sorted value hash — the same three signals
CORRECTNESS_r{N}.json records.

Usage:
    python scripts/check_correctness.py [--sf /root/testdata/sf0.01] \
        [--only entry1,entry2] [--cores 16]

Prints one status line per entry and exits nonzero if any oracle-backed
entry mismatches.  Entries without an oracle are reported rows-only,
exactly like the driver.  The hash here is not guaranteed bit-identical
to the driver's, but any mismatch it finds is real (same rounding, same
column sort, same row sort).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(rows, cols):
    """Canonical value matrix: columns sorted by name, every cell
    stringified with float rounding, rows sorted lexicographically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    import datetime as _dt
    import decimal as _dec

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return format(round(v, 6), ".6f")
        if isinstance(v, _dec.Decimal):
            return format(round(float(v), 6), ".6f")
        if isinstance(v, _dt.datetime):
            # a midnight timestamp and a date are the same bucket key
            if v.time() == _dt.time(0, 0):
                return v.date().isoformat()
            return v.isoformat()
        if isinstance(v, _dt.date):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    mat = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from apache___solr_spark.session import get_spark

    spark = get_spark("check_correctness", cores=args.cores)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    failures = []
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: spark raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            results[name] = {"spark_rows": len(srows), "err": "no_oracle"}
            print(f"ROWS   {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            rows_ok
            and schema_ok
            and _canon(srows, scols) == _canon(orows, ocols)
        )
        results[name] = {
            "rows_match": rows_ok,
            "schema_match": schema_ok,
            "hash_match": hash_ok,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
        }
        status = "OK    " if hash_ok else "FAIL  "
        if not hash_ok:
            failures.append(name)
        detail = ""
        if not rows_ok:
            detail = f" rows {len(srows)} vs {len(orows)}"
        elif not schema_ok:
            detail = f" schema {sorted(scols)} vs {sorted(ocols)}"
        elif not hash_ok:
            detail = " value hash mismatch"
        print(f"{status}{name}: {len(srows)} rows{detail} "
              f"[{time.time()-t0:.1f}s]")

    print(json.dumps({"checked": len(results), "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
