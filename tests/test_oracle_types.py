"""Registry-admission lint for oracle SQL result types (VERDICT r11 #2).

The driver hashes DuckDB result VALUES; DuckDB's HUGEINT (un-cast
integer SUM), DECIMAL (un-cast numeric literals / BIGINT*DECIMAL
arithmetic), and unsigned types hash differently from the Spark side's
long/double even when every value agrees — r11's only two correctness
reds (`deterministic_shard_assign`, `curriculum_length_buckets`) were
exactly this. tests/oracle_check.py converts to Python ints before
comparing, so it normalizes away precisely what the driver hashes; this
lint closes that gap at registry admission: every oracle's DESCRIBE'd
output type must come from the closed allowlist below, so a new
integer-SUM oracle fails the suite the day it's added, not in the next
round's CORRECTNESS file.

Pure DuckDB — no SparkSession, runs in seconds over all ~210 oracles.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentick_spark.workload import ALL_ORACLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# ONE predicate, shared with the per-run checker: imported from
# oracle_check so the admission lint and the sweep gate can never
# diverge (r12 review finding). HUGEINT, DECIMAL(p,s), UBIGINT etc.
# are excluded on purpose — they are the hash-divergence class.
from oracle_check import ALLOWED_SCALAR, type_ok as _type_ok  # noqa: E402,F401


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_output_type_is_hash_safe(con):
    violations = []
    for name, sql in sorted(ALL_ORACLES.items()):
        desc = con.execute("DESCRIBE " + sql).fetchall()
        for row in desc:
            col, typ = row[0], row[1]
            if not _type_ok(typ):
                violations.append((name, col, typ))
    assert not violations, (
        "oracles emitting driver-hash-unsafe DuckDB types (CAST the "
        f"offending expression to BIGINT/DOUBLE): {violations}"
    )


def test_driver_window_oracles_describe_clean(con):
    # the window is a subset of ALL_ORACLES, but DESCRIBE each one
    # explicitly so a window-only registry bug can't hide behind the
    # full-registry loop above
    from opentick_spark.workload import ORACLES

    for name, sql in ORACLES.items():
        desc = con.execute("DESCRIBE " + sql).fetchall()
        assert desc, name
