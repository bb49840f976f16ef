"""Mergeable-sketch operators: HLL rollup and Bloom membership."""

import pytest
from pyspark.sql import functions as F

from opentick_spark.operators import sketch as SK


def _members(spark, n, prefix="m"):
    return spark.range(0, n).select(
        F.concat(F.lit(f"{prefix}-"), F.col("id")).alias("g")
    )


class TestBloom:
    def test_no_false_negatives(self, spark):
        members = _members(spark, 800)
        bloom = SK.bloom_build(members, "g", m_bits=1 << 14, k=5)
        hit = SK.bloom_might_contain(F.col("g"), F.col("bloom"), 1 << 14, 5)
        missed = (
            members.crossJoin(F.broadcast(bloom))
            .filter(~hit)
            .count()
        )
        assert missed == 0

    def test_false_positive_rate_bounded(self, spark):
        # 800 members in a 16 Kbit filter (m/n = 20, k = 5): expected
        # per-probe FPP ~2e-3; 4000 non-members should see well under 5%
        members = _members(spark, 800)
        bloom = SK.bloom_build(members, "g", m_bits=1 << 14, k=5)
        hit = SK.bloom_might_contain(F.col("g"), F.col("bloom"), 1 << 14, 5)
        others = _members(spark, 4000, prefix="x")
        fp = others.crossJoin(F.broadcast(bloom)).filter(hit).count()
        assert fp / 4000 < 0.05

    def test_build_is_duplicate_insensitive(self, spark):
        members = _members(spark, 100)
        doubled = members.union(members)
        a = SK.bloom_build(members, "g", m_bits=1 << 10, k=3).collect()[0][0]
        b = SK.bloom_build(doubled, "g", m_bits=1 << 10, k=3).collect()[0][0]
        assert a == b

    def test_empty_build_rejects_everything(self, spark):
        empty = _members(spark, 0)
        bloom = SK.bloom_build(empty, "g", m_bits=1 << 10, k=3)
        row = bloom.collect()[0]
        assert all(w == 0 for w in row["bloom"])
        hit = SK.bloom_might_contain(F.col("g"), F.col("bloom"), 1 << 10, 3)
        n = (
            _members(spark, 50)
            .crossJoin(F.broadcast(bloom))
            .filter(hit)
            .count()
        )
        assert n == 0

    def test_param_validation(self, spark):
        df = _members(spark, 1)
        with pytest.raises(ValueError, match="multiple of 64"):
            SK.bloom_build(df, "g", m_bits=100)
        with pytest.raises(ValueError, match="k must be"):
            SK.bloom_build(df, "g", m_bits=64, k=0)
        with pytest.raises(ValueError, match="multiple of 64"):
            SK.bloom_might_contain(F.col("g"), F.col("b"), 65)

    def test_width_mismatch_fails_loudly(self, spark):
        # r5 ADVICE regression: probing with an m_bits larger than the
        # built filter used to index past the array -> NULL -> silent
        # false negatives. It must now raise, not drop members.
        members = _members(spark, 50)
        bloom = SK.bloom_build(members, "g", m_bits=1 << 10, k=3)
        hit = SK.bloom_might_contain(F.col("g"), F.col("bloom"), 1 << 14, 3)
        with pytest.raises(Exception, match="width mismatch"):
            members.crossJoin(F.broadcast(bloom)).filter(hit).count()

    def test_probe_is_broadcast_no_smj(self, spark):
        # the corpus-side probe must stay a projection over ONE broadcast
        # bloom row: broadcast nested-loop join, never a sort-merge join
        members = _members(spark, 200)
        bloom = SK.bloom_build(members, "g", m_bits=1 << 12, k=4)
        hit = SK.bloom_might_contain(F.col("g"), F.col("bloom"), 1 << 12, 4)
        probe = (
            _members(spark, 1000)
            .crossJoin(F.broadcast(bloom))
            .select("g", hit.alias("hit"))
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan


class TestHllRollup:
    def test_rollup_within_bound(self, spark):
        # 60k rows, 24 hourly buckets, 3777 true distinct keys
        ev = spark.range(0, 60000).select(
            (F.col("id") % 24).alias("h"), (F.col("id") % 3777).alias("u")
        )
        partials = SK.hll_partials(ev, "u", ["h"], lg_k=12)
        assert partials.count() == 24
        total = SK.hll_rollup(
            partials.withColumn("all", F.lit(1)), ["all"]
        ).collect()[0]
        assert abs(total["approx_distinct"] - 3777) <= 0.08 * 3777

    def test_partials_are_mergeable_state(self, spark):
        # merging hourly partials must estimate the same population as a
        # single-pass sketch over the union — the property that makes
        # pre-aggregated rollups valid
        ev = spark.range(0, 20000).select(
            (F.col("id") % 4).alias("h"), (F.col("id") % 997).alias("u")
        )
        merged = SK.hll_rollup(
            SK.hll_partials(ev, "u", ["h"], lg_k=12).withColumn(
                "all", F.lit(1)
            ),
            ["all"],
        ).collect()[0]["approx_distinct"]
        direct = ev.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("u", 12)).cast("long")
        ).collect()[0][0]
        assert abs(merged - 997) <= 0.08 * 997
        assert abs(direct - 997) <= 0.08 * 997

    def test_rollup_groups_independently(self, spark):
        # two disjoint day groups: each day's estimate tracks its own
        # exact cardinality, not the union's
        ev = spark.range(0, 40000).select(
            (F.col("id") % 2).alias("day"),
            (F.col("id") % 8).alias("h"),
            F.when(F.col("id") % 2 == 0, F.col("id") % 100)
            .otherwise(1000 + F.col("id") % 2000)
            .alias("u"),
        )
        rows = {
            r["day"]: r["approx_distinct"]
            for r in SK.hll_rollup(
                SK.hll_partials(ev, "u", ["day", "h"], lg_k=12), ["day"]
            ).collect()
        }
        exact = {
            r["day"]: r["n"]
            for r in ev.groupBy("day")
            .agg(F.count_distinct("u").alias("n"))
            .collect()
        }
        assert exact[0] != exact[1]  # genuinely disjoint populations
        for day in (0, 1):
            assert abs(rows[day] - exact[day]) <= max(2, 0.08 * exact[day])


class TestStreamingHllRollup:
    def test_stream_maintains_mergeable_state(self, spark, tmp_path):
        """Micro-batches append per-hour sketch partials; the merged
        estimate tracks the exact distinct count over everything
        streamed, and a coarser (2h) rollup works off the same log."""
        from pyspark.sql import functions as F

        from opentick_spark.streaming.rollup import (
            hll_rollup_estimate,
            streaming_hll_rollup,
        )

        hour_ns = 3_600_000_000_000
        ev = spark.range(0, 30000).select(
            ((F.col("id") % 4) * hour_ns + F.col("id")).alias("ts"),
            (F.col("id") % 1500).alias("user_id"),
        )
        src = str(tmp_path / "src")
        ev.repartition(3).write.parquet(src)
        q = streaming_hll_rollup(
            spark,
            src,
            ev.schema,
            partials_dir=str(tmp_path / "partials"),
            checkpoint_dir=str(tmp_path / "ck"),
            key_col="user_id",
        )
        q.awaitTermination()
        est = {
            r["bucket_ts"]: r["approx_distinct"]
            for r in hll_rollup_estimate(
                spark, str(tmp_path / "partials")
            ).collect()
        }
        exact = {
            r["b"]: r["n"]
            for r in ev.groupBy(
                F.expr(f"ts - ts % {hour_ns}").alias("b")
            )
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        assert set(est) == set(exact)
        for b, n in exact.items():
            assert abs(est[b] - n) <= max(2, 0.08 * n)
        # multiple partials per bucket prove cross-batch merging happened
        n_partials = spark.read.parquet(str(tmp_path / "partials")).count()
        assert n_partials > len(exact)
        # coarser rollup from the SAME log: 2h buckets
        coarse = {
            r["bucket_ts"]: r["approx_distinct"]
            for r in hll_rollup_estimate(
                spark, str(tmp_path / "partials"), bucket_seconds=7200
            ).collect()
        }
        assert len(coarse) == 2

    def test_replayed_batch_is_a_noop(self, spark, tmp_path):
        """HLL union is an elementwise register max: appending the same
        partial twice (a crash-replayed micro-batch) must not move the
        estimate — the property that makes append-only state safe."""
        from pyspark.sql import functions as F

        from opentick_spark.operators.sketch import hll_partials
        from opentick_spark.streaming.rollup import hll_rollup_estimate

        ev = spark.range(0, 5000).select(
            F.lit(0).cast("long").alias("bucket_ts"),
            (F.col("id") % 777).alias("user_id"),
        )
        partial = hll_partials(ev, "user_id", ["bucket_ts"])
        path = str(tmp_path / "partials")
        partial.write.mode("append").parquet(path)
        once = hll_rollup_estimate(spark, path).collect()[0]["approx_distinct"]
        partial.write.mode("append").parquet(path)  # the replay
        twice = hll_rollup_estimate(spark, path).collect()[0]["approx_distinct"]
        assert once == twice


class TestCountMin:
    """cms_build / cms_merge / cms_estimate (r12): the mergeable
    frequency sketch — estimates never undercount, partials sum
    cell-wise, and the probe stays a broadcast projection."""

    def _words(self, spark, n_distinct=50, reps=4):
        # deterministic zipf-ish multiset: word i appears (i % reps)+1 times
        return spark.range(0, n_distinct).selectExpr(
            "explode(transform(sequence(1, cast(id % {r} as int) + 1), "
            "x -> concat('w-', id))) AS w".format(r=reps)
        )

    def test_never_underestimates_and_exact_when_roomy(self, spark):
        words = self._words(spark)
        # roomy sketch: width >> distinct → no collisions → exact
        cms = SK.cms_build(words, "w", width=4096, depth=4)
        exact = words.groupBy("w").count()
        est = SK.cms_estimate(exact, cms, "w", width=4096, depth=4)
        bad = est.filter(F.col("cms_est") != F.col("count")).count()
        assert bad == 0

    def test_overestimate_only_under_heavy_collisions(self, spark):
        words = self._words(spark, n_distinct=400)
        # width 8 forces collisions in every cell: estimates may inflate
        # but must NEVER fall below the true count
        cms = SK.cms_build(words, "w", width=8, depth=3)
        exact = words.groupBy("w").count()
        est = SK.cms_estimate(exact, cms, "w", width=8, depth=3)
        under = est.filter(F.col("cms_est") < F.col("count")).count()
        assert under == 0
        # and collisions must actually occur at this width (the test
        # would be vacuous otherwise)
        over = est.filter(F.col("cms_est") > F.col("count")).count()
        assert over > 0

    def test_merge_equals_whole(self, spark):
        words = self._words(spark, n_distinct=120).withColumn(
            "half", F.expr("crc32(w) % 2")
        )
        whole = SK.cms_build(words, "w", width=256, depth=4)
        parts = SK.cms_merge(
            SK.cms_build(words.filter("half = 0"), "w", width=256, depth=4)
            .union(SK.cms_build(words.filter("half = 1"), "w", width=256, depth=4))
        )
        assert whole.collect()[0][0] == parts.collect()[0][0]

    def test_weighted_build_matches_row_build(self, spark):
        words = self._words(spark, n_distinct=80)
        pre = words.groupBy("w").agg(F.count("*").alias("c"))
        a = SK.cms_build(words, "w", width=128, depth=3).collect()[0][0]
        b = SK.cms_build(pre, "w", width=128, depth=3, weight_col="c").collect()[0][0]
        assert a == b

    def test_depth_one_works(self, spark):
        # depth=1 is explicitly allowed by _cms_check but F.least needs
        # >= 2 args (r12 ADVICE): the single-row estimate is that cell
        words = self._words(spark, n_distinct=30)
        cms = SK.cms_build(words, "w", width=2048, depth=1)
        exact = words.groupBy("w").count()
        est = SK.cms_estimate(exact, cms, "w", width=2048, depth=1)
        assert est.filter(F.col("cms_est") < F.col("count")).count() == 0
        # roomy width → collision-free → exact even with one hash row
        assert est.filter(F.col("cms_est") != F.col("count")).count() == 0

    def test_param_validation(self, spark):
        words = self._words(spark, n_distinct=5)
        with pytest.raises(ValueError, match="width"):
            SK.cms_build(words, "w", width=0)
        with pytest.raises(ValueError, match="depth"):
            SK.cms_build(words, "w", depth=0)
        with pytest.raises(ValueError, match="depth"):
            SK.cms_estimate(words, words, "w", depth=17)

    def test_probe_is_broadcast_projection(self, spark):
        # estimate side: broadcast nested-loop over the ONE sketch row,
        # never a sort-merge join — the corpus-probe posture
        words = self._words(spark, n_distinct=60)
        cms = SK.cms_build(words, "w", width=128, depth=3)
        est = SK.cms_estimate(words, cms, "w", width=128, depth=3)
        plan = est._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
