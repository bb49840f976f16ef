"""10x MERGE scale drill (r11, VERDICT r10 item 4): a 1k-row delta
merged into a 1M-row compacted base must do DELTA-RANGE-sized work, not
base-sized work — the Spark analog of the reference's FDB upsert, which
compiles the key to a range and never scans (query.go:294-307).

``merge_delta_1k`` in bench.py proves the pruned path at a 100k-row
base; this drill runs the SAME 1k-delta shape against a 10x base in two
layouts and asserts from the parquet footers (the
test_zorder_compaction_prunes_both_dimensions technique) that the
matched-ness scan's eligible file set stays delta-range-sized:

- **PK-range base** (compact(target_partitions=32), lead-sorted files):
  the delta spans a NARROW lead range [500, 504] of 1000 lead values —
  `_merge_scan`'s [min,max] filter row-group-prunes to the straddling
  files.
- **hash-bucketed base** (compact(hash_buckets=32)): the delta hits ONE
  lead key — `_merge_scan`'s leading_eq path prunes whole __bucket
  DIRECTORIES (a range predicate never can under hash order).

For each layout the drill reports, at 100k and at 1M rows:
merge wall time, total base files/bytes, and the files/bytes ELIGIBLE
under the scan predicate (footer min/max straddle — exactly what
Spark's file skipping + row-group pruning keys on). The assertion:
the ELIGIBLE FILE COUNT does not grow with the base (the delta's lead
range maps to the same number of sorted files / bucket dirs at any
scale — the scan is delta-range-sized, not base-sized), the eligible
byte fraction stays < 15% (measured: ~3%, 1 of 32 files), and merge
wall time grows sublinearly (< 3x for 10x data; measured: flat).

Run: python tests/skew_drill_merge.py   (one JSON line per measurement)
"""

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from opentick_spark.engine import Engine
from opentick_spark.session import get_spark

N_LEADS = 1000  # lead-key cardinality at every scale


def build_base(spark, root: str, n_rows: int, hash_buckets: int | None):
    """1M-row (or 100k) table pk(sec int, tm timestamp): n_rows/1000
    rows per lead key, then one compaction into the drilled layout."""
    eng = Engine(spark, root)
    eng.execute("create database d")
    eng.use("d")
    eng.execute(
        "create table t(sec int, tm timestamp, px double, vol double, "
        "primary key(sec, tm))"
    )
    st = eng.store("d", "t")
    per = n_rows // N_LEADS
    st.append_dataframe(
        spark.range(n_rows).selectExpr(
            f"CAST(id DIV {per} AS int) AS sec",
            f"CAST((id % {per}) * 1000000000 AS long) AS tm",
            "CAST(1.0 + id % 7 AS double) AS px",
            "CAST(100.0 AS double) AS vol",
        )
    )
    st.compact(spark, target_partitions=32, hash_buckets=hash_buckets)
    return st


def delta_1k(spark, per: int, single_key: bool):
    """1000-row delta with DISTINCT PKs at both base scales (r11 review:
    a tm of id%per collapsed updates into duplicate PKs at per=100,
    making the 100k and 1M comparisons different workloads).

    Range layout: 500 updates across leads 500..504 (tm = id DIV 5 —
    0..99 within each lead, existing at any per >= 100) + 500 inserts
    past the tm range. Bucketed layout: ONE lead key, whose existing
    tms are only 0..per-1 — the update count is pinned at 100 so the
    delta shape is IDENTICAL at both scales (100 updates + 900
    inserts)."""
    if single_key:
        return spark.range(1000).selectExpr(
            "CAST(500 AS int) AS sec",
            f"CAST((CASE WHEN id < 100 THEN id ELSE {per} + id END) "
            "* 1000000000 AS long) AS tm",
            "CAST(9.9 AS double) AS px",
            "CAST(1.0 AS double) AS vol",
        )
    return spark.range(1000).selectExpr(
        "CAST(500 + id % 5 AS int) AS sec",
        f"CAST((CASE WHEN id < 500 THEN id DIV 5 ELSE {per} + id END) "
        "* 1000000000 AS long) AS tm",
        "CAST(9.9 AS double) AS px",
        "CAST(1.0 AS double) AS vol",
    )


def footer_eligibility(base_path: str, lo: int, hi: int, bucket_of=None):
    """Files/bytes a scan with sec in [lo, hi] can touch, from footer
    stats alone — file-level min/max straddle (what Spark's file skip +
    row-group pruning keys on). For a bucketed base, directory pruning
    applies FIRST: only __bucket dirs in bucket_of(lo..hi) are eligible
    at all (leading_eq path)."""
    files = glob.glob(f"{base_path}/**/*.parquet", recursive=True)
    total_b = elig_b = 0
    total_f = elig_f = 0
    want_buckets = (
        {bucket_of(v) for v in range(lo, hi + 1)} if bucket_of else None
    )
    for f in files:
        size = os.path.getsize(f)
        total_b += size
        total_f += 1
        if want_buckets is not None:
            part = [p for p in f.split(os.sep) if p.startswith("__bucket=")]
            if part and int(part[0].split("=")[1]) not in want_buckets:
                continue  # directory-pruned: never opened
        md = pq.ParquetFile(f).metadata
        hit = False
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if (
                    c.path_in_schema.startswith("sec")
                    and c.statistics is not None
                    and c.statistics.min <= hi
                    and c.statistics.max >= lo
                ):
                    hit = True
        if hit:
            elig_b += size
            elig_f += 1
    return {
        "files_total": total_f,
        "files_eligible": elig_f,
        "bytes_total": total_b,
        "bytes_eligible": elig_b,
        "bytes_fraction": round(elig_b / max(1, total_b), 4),
    }


def drill(spark, n_rows: int, hash_buckets: int | None) -> dict:
    root = tempfile.mkdtemp(prefix="otspark_mergedrill_")
    try:
        st = build_base(spark, root, n_rows, hash_buckets)
        per = n_rows // N_LEADS
        single = hash_buckets is not None
        src = delta_1k(spark, per, single_key=single)
        lo, hi = (500, 500) if single else (500, 504)
        bucket_of = None
        if hash_buckets:
            # same function the writer uses: pmod(xxhash64(sec), nb)
            def bucket_of(v, nb=hash_buckets):
                return (
                    spark.sql(
                        f"SELECT pmod(xxhash64(CAST({v} AS int)), {nb})"
                    ).collect()[0][0]
                )

        elig = footer_eligibility(st.base_path, lo, hi, bucket_of)
        t0 = time.time()
        st.merge_into(spark, src)
        wall = round(time.time() - t0, 3)
        # post-merge sanity: updates landed, inserts landed
        n_inserts = 900 if single else 500
        got = st.read(spark)
        n_now = got.count()
        assert n_now == n_rows + n_inserts, (n_now, n_rows)
        return {
            "metric": "merge_drill",
            "layout": "bucketed" if hash_buckets else "pk_range",
            "base_rows": n_rows,
            "merge_s": wall,
            **elig,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    spark = get_spark(app_name="merge_drill", shuffle_partitions=32)
    rows = []
    for hb in (None, 32):
        for n in (100_000, 1_000_000):
            r = drill(spark, n, hb)
            rows.append(r)
            print(json.dumps(r, separators=(",", ":")), flush=True)
    by = {(r["layout"], r["base_rows"]): r for r in rows}
    for layout in ("pk_range", "bucketed"):
        small, big = by[(layout, 100_000)], by[(layout, 1_000_000)]
        assert big["files_eligible"] <= small["files_eligible"], (
            layout,
            small["files_eligible"],
            big["files_eligible"],
        )
        assert big["bytes_fraction"] < 0.15, (layout, big["bytes_fraction"])
        assert big["merge_s"] < 3 * max(small["merge_s"], 0.5), (
            layout,
            small["merge_s"],
            big["merge_s"],
        )
    print(
        json.dumps(
            {"metric": "merge_drill_verdict", "status": "OK"},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
