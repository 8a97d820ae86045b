"""Statistical/determinism properties of the rows-only sampling queries."""

from __future__ import annotations

import math

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.queries.projections import (
    _stratified_sample_rows,
)
from big_data__instagram_analysis_spark.registry import get_specs  # noqa: F401

FRACTIONS = {"view": 0.1, "click": 0.1, "purchase": 1.0, "signup": 0.5, "error": 0.02}


def test_stratified_fractions_within_binomial_ci(spark, sf_dir):
    fn = _stratified_sample_rows
    got = {
        r["event_type"]: r["n"]
        for r in fn(spark, sf_dir).groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    pop = {
        r["event_type"]: r["count"]
        for r in load(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    for etype, frac in FRACTIONS.items():
        n = pop[etype]
        k = got.get(etype, 0)
        if frac == 1.0:
            assert k == n, f"{etype}: exhaustive stratum must keep all {n} rows"
            continue
        # 5-sigma binomial window — loose enough to never flake, tight
        # enough to catch a fraction applied to the wrong stratum.
        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(k - n * frac) <= 5 * sigma + 1, (etype, k, n * frac, sigma)


def test_stratified_sample_is_seed_deterministic(spark, sf_dir):
    fn = _stratified_sample_rows
    a = sorted(r["event_id"] for r in fn(spark, sf_dir).collect())
    b = sorted(r["event_id"] for r in fn(spark, sf_dir).collect())
    assert a == b and len(a) > 0
