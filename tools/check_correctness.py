"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at sf0.01 (or
$SPARK_GRAFT_SF_DIR), runs the matching ``oracle_sql()`` in DuckDB over the
same parquet, and compares row count, sorted column names, and an
order-insensitive value hash (exact values — stricter than any plausible
driver tolerance).  Exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return repr(f)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return repr(float(v)) if False else str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig_rows = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return sorted(cols), sig_rows


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as entrymod
    from tostore_spark import get_spark

    spark = get_spark(app_name="check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, weak = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            complex_cols = [f.name for f in df.schema.fields
                            if f.dataType.typeName() in ("array", "map", "struct")]
            if complex_cols:
                # the driver's pandas canonicalizer cannot sort list/struct
                # cells — this would be an ERR row in CORRECTNESS_r{N}.json
                failures.append((name, f"complex output columns {complex_cols}"))
                print(f"FAIL  {name}: complex (array/map/struct) output columns "
                      f"{complex_cols} — driver canonicalizer would crash")
                continue
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            weak += 1
            print(f"weak  {name}: rows={len(rows)} (no oracle, rows-only check)"
                  f" [spark {t_spark:.1f}s]")
            if len(rows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        t1 = time.time()
        try:
            # fetch through pandas, like the driver does: DuckDB HUGEINT
            # (e.g. sum(BIGINT)) degrades to float64 here and will (rightly)
            # hash-mismatch an integer Spark column — cast to BIGINT in the
            # oracle SQL instead of "fixing" this fetch path.
            opdf = con.execute(oracles[name]).df()
            ocols = list(opdf.columns)
            orows = list(opdf.itertuples(index=False, name=None))
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        scols, srows = frame_signature(cols, rows)
        o_cols, o_rows = frame_signature(ocols, orows)
        if scols != o_cols:
            failures.append((name, f"columns differ: spark={scols} oracle={o_cols}"))
            print(f"FAIL  {name}: columns differ\n  spark : {scols}\n  oracle: {o_cols}")
        elif len(srows) != len(o_rows):
            failures.append((name, f"row count: spark={len(srows)} oracle={len(o_rows)}"))
            print(f"FAIL  {name}: row count spark={len(srows)} oracle={len(o_rows)}")
        elif srows != o_rows:
            diff_i = next(i for i, (a, b) in enumerate(zip(srows, o_rows)) if a != b)
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch at sorted row {diff_i}"
                  f"\n  spark : {srows[diff_i][:300]}\n  oracle: {o_rows[diff_i][:300]}")
        else:
            passed += 1
            # engine-vs-oracle split: a slow line whose time sits in
            # the duck column is DuckDB's oracle cost, not an engine
            # regression (q_fuzzy_match's blocked-levenshtein rebuild)
            print(f"ok    {name}: rows={len(rows)} "
                  f"[spark {t_spark:.1f}s / duck {time.time()-t1:.1f}s]")

    print(f"\n{passed} ok, {weak} weak (rows-only), {len(failures)} failed"
          f" / {len([n for n in qs if not only or n in only])} total")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
