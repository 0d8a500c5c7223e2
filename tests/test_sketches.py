"""Sketch variants vs their exact anchors: HLL++ distinct counts within the
configured relative error, KLL percentiles within rank-error bounds."""

from __future__ import annotations

from photo_vector_search_spark.plans.pipeline_queries import (
    approx_data_profile,
    approx_distinct_counts,
    q_data_profile,
    q_distinct_counts,
)
from photo_vector_search_spark.sources.tables import load_table


def test_approx_distinct_counts_within_rsd(spark, sf_correct):
    exact = q_distinct_counts(spark, sf_correct).first()
    docs = load_table(spark, sf_correct, "documents")
    approx = approx_distinct_counts(docs, rsd=0.02).first()
    assert approx["n_docs"] == exact["n_docs"]  # plain count stays exact
    for col in ("n_langs", "n_sources", "n_texts"):
        e, a = exact[col], approx[col]
        # 5 sigma of the configured rsd — loose enough to be deterministic for
        # this fixture, tight enough to catch a mis-wired sketch
        assert abs(a - e) <= max(1, 5 * 0.02 * e), (col, e, a)


def test_approx_data_profile_rank_error_bounded(spark, sf_correct):
    """approx_percentile guarantees RANK error <= 1/accuracy: the estimate for
    quantile q must be an element whose exact rank lies in
    [q - eps, q + eps]. Verified per group against the sorted values."""
    events = load_table(spark, sf_correct, "events")
    accuracy = 10_000
    eps = 1.0 / accuracy
    approx = {
        r["event_type"]: r for r in approx_data_profile(events, accuracy).collect()
    }
    exact = {r["event_type"]: r for r in q_data_profile(spark, sf_correct).collect()}
    assert set(approx) == set(exact)
    vals = {
        et: sorted(
            r["value"]
            for r in events.filter(events.event_type == et).select("value").collect()
        )
        for et in approx
    }
    for et, row in approx.items():
        assert row["min_v"] == exact[et]["min_v"]
        assert row["max_v"] == exact[et]["max_v"]
        assert row["n"] == exact[et]["n"]
        xs = vals[et]
        n = len(xs)
        for col, q in (("median_v", 0.5), ("p95_v", 0.95)):
            lo = xs[max(0, int((q - 2 * eps) * (n - 1)))]
            hi = xs[min(n - 1, int((q + 2 * eps) * (n - 1)) + 1)]
            assert lo - 1e-6 <= row[col] <= hi + 1e-6, (et, col, row[col], lo, hi)
