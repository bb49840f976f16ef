"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() side-by-side at
sf0.01 and compare row count, column names, and values (sorted columns,
order-insensitive rows) — and, since r12, the ORACLE RESULT TYPES.

The r11 lesson (VERDICT #2): value comparison here converts DuckDB
cells to Python objects first, which normalizes away exactly the type
dimension the driver's value hash is sensitive to — an un-cast integer
SUM (HUGEINT) or numeric literal (DECIMAL) compared equal locally but
hashed red in CORRECTNESS_r11. So this checker now also DESCRIBEs each
oracle and fails on any output type outside the hash-safe allowlist
(BIGINT/INTEGER/DOUBLE/FLOAT/VARCHAR/BOOLEAN + lists); the same lint
runs at registry admission in tests/test_oracle_types.py.

Usage: python tests/oracle_check.py [query ...]   (default: all)
"""

from __future__ import annotations

import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# THE hash-safe oracle output types — the single predicate both this
# checker and the registry-admission lint (tests/test_oracle_types.py)
# import, so the two gates can never diverge (r12 review finding:
# the first cut had two copies that disagreed on nested lists).
ALLOWED_SCALAR = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
}
_ARRAY_SUFFIX = re.compile(r"^(.*)\[\d*\]$")


def type_ok(typ: str) -> bool:
    """Recursive: lists (``DOUBLE[]``), nested lists (``DOUBLE[][]``),
    and DuckDB fixed-size arrays (``DOUBLE[3]``) are allowed iff their
    element type is."""
    typ = typ.strip()
    m = _ARRAY_SUFFIX.match(typ)
    if m:
        return type_ok(m.group(1))
    return typ in ALLOWED_SCALAR


def type_violations(con, sql):
    out = []
    for row in con.execute("DESCRIBE " + sql).fetchall():
        col, typ = row[0], row[1]
        if not type_ok(typ):
            out.append((col, typ))
    return out


def norm_cell(v):
    # exact comparison — stricter than any value-hash the driver may use;
    # float outputs must already be rounded identically by both sides
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in idx) for r in rows), key=repr
    )


def main():
    import __spark_entry__ as entrymod
    from opentick_spark.session import get_spark
    from opentick_spark.workload import EXTRA_ORACLES, EXTRA_QUERIES

    # one session runs all 109 registry queries back-to-back — a larger
    # working set than the bench's; 8g measured safe (the 1g default is
    # tuned for the short driver-shaped bench run, see session.py)
    spark = get_spark(
        app_name="oracle_check", shuffle_partitions=8, driver_memory="8g"
    )
    # driver-window queries (via the driver's own entry points) PLUS the
    # extra relational registry the driver doesn't see — all oracle-checked
    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    for name, fn in EXTRA_QUERIES.items():
        qs[name] = lambda spark, sf_dir, fn=fn: fn(spark, sf_dir)
    oracles.update(EXTRA_ORACLES)
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(rows)} rows  {dt:.1f}s")
            if len(rows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: rows-only query returned 0 rows")
            continue
        try:
            tviol = type_violations(con, oracles[name])
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        ok = True
        if tviol:
            ok = False
            print(
                f"FAIL  {name}: hash-unsafe oracle output types "
                f"(CAST to BIGINT/DOUBLE): {tviol}"
            )
        if sorted(cols) != sorted(ocols):
            ok = False
            print(f"FAIL  {name}: columns {sorted(cols)} vs oracle {sorted(ocols)}")
        elif len(rows) != len(orows):
            ok = False
            print(f"FAIL  {name}: rowcount {len(rows)} vs oracle {len(orows)}")
        else:
            a = norm_rows(cols, rows)
            b = norm_rows(ocols, orows)
            if a != b:
                ok = False
                bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {bad}")
        if ok:
            print(f"OK    {name}: {len(rows)} rows  {dt:.1f}s")
        else:
            failures.append(name)
    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
