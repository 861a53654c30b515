#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<query>/ parquet (written by graft.Verify),
runs the corresponding oracle SQL from oracle_sql.json in DuckDB against
the sf_dir parquet tables, and compares: schema (column names), row count,
and values (columns sorted by name, rows sorted, exact equality; floats
compared bit-exactly first, with a 1e-9-relative fallback reported
separately so we can see *how* close a mismatch is).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_rows(cols, rows):
    # sort columns by name, then rows lexicographically (None-safe)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(
        (x is None, str(type(x)), x if not isinstance(x, (list, tuple)) else str(x))
        for x in r))


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True, True
        close = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
        return False, close
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return a == b


def compare(name, spark_dir, sql, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        rel = con.sql(sql)
        # The driver's hash path materializes the oracle result through
        # arrow/pandas, where HUGEINT/DECIMAL columns take a different
        # representation than Spark's int64/double — values compare equal
        # here via fetchall() (python ints) but hash-mismatch at the
        # driver. Flag them before they reach the gate.
        widened = [(n, str(t)) for n, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t) or "DECIMAL" in str(t)]
        if widened:
            return f"ORACLE_TYPE_WIDENED {widened} (CAST to BIGINT/DOUBLE)"
        oracle = con.execute(sql)
        ocols = [d[0] for d in oracle.description]
        orows = oracle.fetchall()
    except Exception as e:
        return f"ORACLE_ERROR {e}"
    try:
        sp = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols = [d[0] for d in sp.description]
        srows = sp.fetchall()
    except Exception as e:
        return f"SPARK_READ_ERROR {e}"
    ocols_s, orows_s = norm_rows(ocols, orows)
    scols_s, srows_s = norm_rows(scols, srows)
    if ocols_s != scols_s:
        return f"SCHEMA_MISMATCH spark={scols_s} oracle={ocols_s}"
    if len(orows_s) != len(srows_s):
        return f"ROWCOUNT_MISMATCH spark={len(srows_s)} oracle={len(orows_s)}"
    n_close = 0
    for i, (sr, orow) in enumerate(zip(srows_s, orows_s)):
        for c, (sv, ov) in enumerate(zip(sr, orow)):
            r = values_equal(sv, ov)
            exact, close = r if isinstance(r, tuple) else (r, r)
            if not exact:
                if close:
                    n_close += 1
                    continue
                return (f"VALUE_MISMATCH row={i} col={ocols_s[c]} "
                        f"spark={sv!r} oracle={ov!r}")
    if n_close:
        return f"CLOSE_ONLY ({n_close} float values ~equal but not bit-exact)"
    return f"OK ({len(srows_s)} rows)"


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle_sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        if name not in oracle_sql:
            n = duckdb.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
            results[name] = f"ROWS_ONLY ({n} rows)"
            continue
        results[name] = compare(name, str(qdir), oracle_sql[name], sf_dir)
    declared_missing = set(oracle_sql) - {p.name for p in Path(out_dir).iterdir()}
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for name, v in sorted(results.items()):
        print(f"{name:<{width}}  {v}")
    for name in sorted(declared_missing):
        print(f"{name:<{width}}  MISSING_SPARK_OUTPUT")
    print(f"\n{n_ok}/{len(results)} green"
          + (f", {len(declared_missing)} missing outputs" if declared_missing else ""))
    sys.exit(0 if n_ok == len(results) and not declared_missing else 1)


if __name__ == "__main__":
    main()
