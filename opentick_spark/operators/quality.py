"""Single-pass data-quality validation (the Deequ/expectations pattern
sized for 100 TB): every rule compiles to an aggregate expression, the
whole suite runs as ONE aggregation over ONE scan — adding a rule never
adds a pass.

Rules (each yields one row: rule, metric, passed):

- ``not_null(col, max_null_frac=0.0)``      — NULL fraction bound
- ``unique(col)``                           — duplicate count must be 0
- ``in_range(col, lo, hi)``                 — out-of-range count must be 0
- ``accepted_values(col, values)``          — unexpected-value count = 0
- ``min_rows(n)``                           — row-count floor
- ``matches(col, regex, max_bad_frac=0.0)`` — pattern-violation bound

``unique`` is the one rule a plain aggregate cannot express
(count-distinct is itself an aggregate); it uses ``count - count_distinct``
inside the same aggregation — exact, at the cost of the count-distinct
expansion Spark plans for it. Swap for ``approx_unique`` when an
approximate bound is acceptable at extreme cardinality.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    metric: Column  # aggregate expression producing the observed number
    bound: float  # metric must be <= bound (or >= for floor rules)
    floor: bool = False  # True: metric must be >= bound
    meta: dict[str, Any] = field(default_factory=dict)


def not_null(col: str, max_null_frac: float = 0.0) -> Rule:
    m = (
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("double")
        / F.greatest(F.count(F.lit(1)), F.lit(1))
    )
    return Rule(f"not_null({col})", m, max_null_frac)


def unique(col: str) -> Rule:
    m = (F.count(col) - F.count_distinct(F.col(col))).cast("double")
    return Rule(f"unique({col})", m, 0.0)


def approx_unique(col: str, rsd: float = 0.01) -> Rule:
    """HLL-based duplicate bound: tolerates the sketch's relative error
    (passes when count <= (1 + 2·rsd) · approx_distinct)."""
    m = (
        F.count(col).cast("double")
        / F.greatest(F.approx_count_distinct(col, rsd), F.lit(1)).cast("double")
    )
    return Rule(f"approx_unique({col})", m, 1.0 + 2 * rsd)


def in_range(col: str, lo: float, hi: float) -> Rule:
    m = F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1).otherwise(0)
    ).cast("double")
    return Rule(f"in_range({col},{lo},{hi})", m, 0.0)


def accepted_values(col: str, values: list) -> Rule:
    m = F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
    ).cast("double")
    return Rule(f"accepted_values({col})", m, 0.0)


def min_rows(n: int) -> Rule:
    return Rule(f"min_rows({n})", F.count(F.lit(1)).cast("double"), float(n), floor=True)


def matches(col: str, regex: str, max_bad_frac: float = 0.0) -> Rule:
    bad = F.sum(
        F.when(
            F.col(col).isNotNull() & ~F.col(col).rlike(regex), 1
        ).otherwise(0)
    ).cast("double")
    m = bad / F.greatest(F.count(col), F.lit(1))
    return Rule(f"matches({col})", m, max_bad_frac)


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run the whole suite as ONE aggregation. Output: one row per rule
    (rule, metric, bound, passed) in the given order."""
    if not rules:
        raise ValueError("no rules given")
    aggs = [r.metric.alias(f"__m{i}") for i, r in enumerate(rules)]
    row = df.agg(*aggs)
    out = []
    for i, r in enumerate(rules):
        m = F.col(f"__m{i}")
        ok = (m >= r.bound) if r.floor else (m <= r.bound)
        out.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.round(m, 6).alias("metric"),
                F.lit(r.bound).alias("bound"),
                ok.alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*out)).alias("r")).select(
        "r.rule", "r.metric", "r.bound", "r.passed"
    )


# -- streaming / incremental validation -------------------------------------
#
# Every rule above except ``unique`` is ALGEBRAIC: its metric derives
# from sums and counts, so per-micro-batch partials merge exactly. The
# streaming form accumulates (sum, count) partials per rule and derives
# the same report validate() would produce over the union of all
# batches seen — continuous validation of an ingest feed at per-batch
# cost. (`unique` needs distinct state and is intentionally excluded;
# use the batch path or dropDuplicates upstream.)


def partial_metrics(rules: list[Rule]) -> list:
    """Aggregate expressions for one batch's partials: per rule a
    numerator/denominator pair. Count-style rules carry den=0 so the
    merged metric Σnum/max(Σden,1) stays a plain count — a per-batch
    den=1 would wrongly divide by the number of batches."""
    aggs = []
    for i, r in enumerate(rules):
        num, den = r.meta.get("num"), r.meta.get("den")
        if num is None:
            raise ValueError(
                f"rule {r.name!r} is not incremental (no partials)"
            )
        aggs.append(num.alias(f"__n{i}"))
        aggs.append(den.alias(f"__d{i}"))
    return aggs


def _inc(name: str, num, den, bound: float, floor: bool = False) -> Rule:
    # metric column used by batch validate(); num/den drive the
    # incremental path
    metric = num / F.greatest(den, F.lit(1))
    return Rule(name, metric, bound, floor, {"num": num, "den": den})


def inc_not_null(col: str, max_null_frac: float = 0.0) -> Rule:
    return _inc(
        f"not_null({col})",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("double"),
        F.count(F.lit(1)).cast("double"),
        max_null_frac,
    )


def inc_in_range(col: str, lo: float, hi: float) -> Rule:
    return _inc(
        f"in_range({col},{lo},{hi})",
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1
            ).otherwise(0)
        ).cast("double"),
        F.lit(0.0),
        0.0,
    )


def inc_accepted_values(col: str, values: list) -> Rule:
    return _inc(
        f"accepted_values({col})",
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(values), 1
            ).otherwise(0)
        ).cast("double"),
        F.lit(0.0),
        0.0,
    )


def inc_min_rows(n: int) -> Rule:
    return _inc(
        f"min_rows({n})",
        F.count(F.lit(1)).cast("double"),
        F.lit(0.0),
        float(n),
        floor=True,
    )


def merge_report(spark, partials_df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Merge accumulated per-batch partials into the final report —
    identical shape to :func:`validate`'s output."""
    sums = partials_df.agg(
        *[F.sum(f"__n{i}").alias(f"__n{i}") for i in range(len(rules))],
        *[F.sum(f"__d{i}").alias(f"__d{i}") for i in range(len(rules))],
    )
    out = []
    for i, r in enumerate(rules):
        m = F.col(f"__n{i}") / F.greatest(F.col(f"__d{i}"), F.lit(1))
        ok = (m >= r.bound) if r.floor else (m <= r.bound)
        out.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.round(m, 6).alias("metric"),
                F.lit(r.bound).alias("bound"),
                ok.alias("passed"),
            )
        )
    return sums.select(F.explode(F.array(*out)).alias("r")).select(
        "r.rule", "r.metric", "r.bound", "r.passed"
    )
