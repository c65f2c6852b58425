"""Local mini-driver: run every queries() entry against its oracle_sql()
twin in DuckDB at a given sf and report row-count / schema / value-set
mismatches — a faster feedback loop than waiting for the driver round.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

from datalake_imagenes_georreferenciadas_spark.session import get_spark
from __spark_entry__ import oracle_sql, queries


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return repr(v)


def row_key(row):
    return tuple(norm_cell(v) for v in row)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(row_key(tuple(r[c] for c in cols)) for r in sdf.collect())
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=8)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols_raw = res.columns
            # The driver fetches the DuckDB side via Arrow/pandas, which
            # widens non-int64 integer types (HUGEINT from sum(INTEGER),
            # unsigned ints, ...) to float64 — hash-mismatching against
            # Spark's int64 even when values are equal. Flag those here so
            # the local fetchall() (which hides the widening) can't lie.
            widened = [
                f"{c}:{t}"
                for c, t in zip(dcols_raw, (str(t) for t in res.types))
                if t.split("(")[0]
                in {"HUGEINT", "UHUGEINT", "UINTEGER", "UBIGINT"}
                or t.startswith("DECIMAL")
            ]
            if widened:
                print(f"WARN {name}: oracle emits non-int64/decimal {widened} "
                      "— driver pandas fetch will widen; CAST in the SQL")
            dsort = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            dcols = sorted(dcols_raw)
            drows = sorted(row_key(tuple(row[i] for i in dsort)) for row in res.fetchall())
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=8)
            n_fail += 1
            continue
        ok = True
        if cols != dcols:
            print(f"FAIL {name}: schema spark={cols} duck={dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        elif srows != drows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: ")
            i = diffs[0]
            print(f"  spark: {srows[i]}")
            print(f"  duck : {drows[i]}")
            ok = False
        if ok:
            print(f"pass {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
