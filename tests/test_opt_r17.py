"""Round-17 optimization pins: every operator whose internals changed in
the optimization round keeps a test proving the rewrite is value-identical
(and, where cheap to assert, that the intended plan/job shape holds)."""

import pytest
from pyspark.sql import functions as F

from tostore_spark.plans import stats as S


@pytest.fixture(scope="module")
def spark():
    from tostore_spark import get_spark
    return get_spark(app_name="opt-r17-tests")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet")


class TestOnePassPercentiles:
    """exact_percentiles_frame small-input tier (r17): one single-pass
    job replaces sketch + checkpoint + counts + selection, values
    bit-identical by construction."""

    def test_tiers_bit_identical(self, spark, events):
        fracs = [0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]
        small = S.exact_percentiles_frame(
            events, "value", fracs, round_dp=6).first()["__bounds"]
        spark.conf.set("spark.tostore.percentile.onepass.maxRows", "1")
        try:
            big = S.exact_percentiles_frame(
                events, "value", fracs, round_dp=6).first()["__bounds"]
        finally:
            spark.conf.unset("spark.tostore.percentile.onepass.maxRows")
        assert small == big

    def test_tiers_bit_identical_unrounded(self, spark, events):
        small = S.exact_percentiles_frame(
            events, "value", [0.5]).first()["__bounds"]
        spark.conf.set("spark.tostore.percentile.onepass.maxRows", "1")
        try:
            big = S.exact_percentiles_frame(
                events, "value", [0.5]).first()["__bounds"]
        finally:
            spark.conf.unset("spark.tostore.percentile.onepass.maxRows")
        assert small == big

    def test_empty_input(self, spark, events):
        out = S.exact_percentiles_frame(
            events.filter("value > 1e18"), "value", [0.5]).first()
        assert out["__bounds"] == []

    def test_checkpointed_input_routes_and_matches(self, spark, events):
        """Plan-size-unknown lineage (checkpointed RDD) still resolves
        exactly — the sketch-job count adjudicates the tier."""
        ck = events.select("value").localCheckpoint(eager=True)
        got = S.exact_percentiles_frame(ck, "value", [0.5],
                                        round_dp=6).first()["__bounds"]
        ref = S.exact_percentiles_frame(events, "value", [0.5],
                                        round_dp=6).first()["__bounds"]
        assert got == ref

    def test_onepass_runs_fewer_jobs(self, spark, events):
        """The small tier schedules strictly fewer Spark jobs than the
        bucketed tier (the point of the rewrite).  Counted per job
        group; AQE may split one query into a couple of stage-jobs, so
        the pin is the TIER DELTA, not an absolute."""
        sc = spark.sparkContext
        tracker = sc.statusTracker()

        def jobs_for(group, fn):
            sc.setJobGroup(group, group)
            try:
                fn()
                return len(tracker.getJobIdsForGroup(group) or [])
            finally:
                sc.setJobGroup(None, None)

        n_small = jobs_for("onepass-small", lambda: S.exact_percentiles_frame(
            events, "value", [0.5], round_dp=6))
        spark.conf.set("spark.tostore.percentile.onepass.maxRows", "1")
        try:
            n_big = jobs_for("onepass-big", lambda: S.exact_percentiles_frame(
                events, "value", [0.5], round_dp=6))
        finally:
            spark.conf.unset("spark.tostore.percentile.onepass.maxRows")
        assert n_small < n_big, (n_small, n_big)
        assert n_small <= 2, f"one-pass tier scheduled {n_small} jobs"
