"""Round-5 operator tests: merge_asof differential vs pandas (the
authoritative as-of semantics), plan-shape asserts for the union+window
strategy, and local oracle checks for the five new registry queries."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_expr_rapids_spark.operators.asof import merge_asof
from dask_expr_rapids_spark.plans import plan_of
from dask_expr_rapids_spark.queries import REGISTRY

from .conftest import SF_DIR, assert_matches_oracle


def _asof_fixture():
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "t": [10, 20, 30, 5, 50, 7],
            "lv": ["a", "b", "c", "d", "e", "f"],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 4],
            "t": [15, 20, 40, 1],
            "rv": [1.5, 2.0, 4.0, 9.9],
        }
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_merge_asof_matches_pandas(spark, direction, exact):
    left, right = _asof_fixture()
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
    ).sort_values(["k", "t"])

    got = (
        merge_asof(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            direction=direction,
            allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values(["k", "t"])
    )
    exp = list(zip(expected["k"], expected["t"], expected["lv"], expected["rv"]))
    act = list(zip(got["k"], got["t"], got["lv"], got["asof_rv"]))

    def norm(rows):
        return [(k, t, lv, None if pd.isna(rv) else rv) for k, t, lv, rv in rows]

    assert norm(act) == norm(exp), f"{direction}/{exact}: {norm(act)} != {norm(exp)}"


def test_merge_asof_single_shuffle_no_join(spark):
    """The scale contract: NO join node at all (union+window), so hot keys
    cannot amplify — one Exchange on the by-key, one Window."""
    left, right = _asof_fixture()
    df = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right), on="t", by="k"
    )
    plan = plan_of(df, "simple")
    assert "Join" not in plan, plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_merge_asof_null_on_gets_no_match(spark, direction):
    """pandas rejects null `on`; the engine defines them: null-`on` left
    rows survive unmatched in BOTH directions (the forward direction is
    the trap — default desc ordering would put nulls last, where the
    window sees every right row), and null-`on` right rows match nothing."""
    left = pd.DataFrame({"k": [1, 1, 1], "t": [10.0, None, 30.0], "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [1, 1], "t": [20.0, None], "rv": [5.0, 9.9]})
    got = (
        merge_asof(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="t", by="k", direction=direction,
        )
        .toPandas()
        .set_index("lid")
    )
    assert pd.isna(got.loc[1, "asof_rv"]), f"null-on left row matched: {got}"
    assert 9.9 not in set(got["asof_rv"].dropna()), f"null-on right row leaked: {got}"
    matched = got.loc[0 if direction == "forward" else 2, "asof_rv"]
    assert matched == 5.0, got


def test_merge_asof_rejects_bad_direction(spark):
    left, right = _asof_fixture()
    with pytest.raises(ValueError, match="direction"):
        merge_asof(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="t", by="k", direction="nearest",
        )


ROUND5_QUERIES = [
    "asof_join_click_purchase",
    "unpivot_lineitem_amounts",
    "gapfill_hourly_event_counts",
    "histogram_order_totals",
    "listagg_nations_by_region",
    "json_props_extract_agg",
    "skew_salted_join_revenue",
    "skew_salted_groupby_users",
    "dataset_split_assign",
    "decontaminate_train_eval",
    "range_join_first_hour_events",
    "time_rollup_multigrain",
]


def test_interval_join_matches_naive(spark):
    """Bucketed interval join == naive range-predicate join, including
    intervals spanning multiple buckets and points on both boundaries."""
    import datetime as dt

    from dask_expr_rapids_spark.operators.rangejoin import interval_join

    base = dt.datetime(2024, 1, 1)
    pts = pd.DataFrame(
        {
            "pid": range(8),
            "t": [base + dt.timedelta(minutes=m) for m in [0, 30, 60, 90, 119, 120, 121, 500]],
        }
    )
    ivs = pd.DataFrame(
        {
            "iid": [1, 2, 3],
            "lo": [base, base + dt.timedelta(minutes=60), base + dt.timedelta(minutes=400)],
            "hi": [
                base + dt.timedelta(minutes=120),  # spans 3 hourly buckets
                base + dt.timedelta(minutes=61),
                base + dt.timedelta(minutes=401),  # matches nothing
            ],
        }
    )
    spts, sivs = spark.createDataFrame(pts), spark.createDataFrame(ivs)
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(spts, sivs, "t", "lo", "hi", bucket_seconds=3600).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in spts.join(sivs, (spts.t >= sivs.lo) & (spts.t <= sivs.hi)).collect()
    )
    assert got == naive and len(got) > 0, (got, naive)


def test_interval_join_rejects_outer(spark):
    from dask_expr_rapids_spark.operators.rangejoin import interval_join

    df = spark.range(1).select(F.current_timestamp().alias("t"))
    with pytest.raises(ValueError, match="inner"):
        interval_join(df, df.select(F.col("t").alias("lo"), F.col("t").alias("hi")),
                      "t", "lo", "hi", how="left")


def test_decontaminate_broadcasts_eval_grams(spark):
    """Scale contract: the benchmark-sized eval gram set must reach the
    training side as a broadcast — a shuffle join keyed on gram text would
    move the full training gram stream."""
    plan = plan_of(REGISTRY["decontaminate_train_eval"].fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


@pytest.mark.parametrize("name", ROUND5_QUERIES)
def test_round5_queries_match_oracle(spark, oracle, name):
    q = REGISTRY[name]
    assert q.sql is not None
    assert_matches_oracle(q.fn(spark, SF_DIR), oracle, q.sql, name)


def test_gapfill_has_zero_rows(spark):
    """The spine must actually fill gaps: at sf0.001 (1000 events over a
    month = 720 hourly buckets) some hours are empty.  At larger SFs every
    hour has events — then assert the dense-spine invariant instead
    (test runs at $SPARK_GRAFT_TEST_SF_DIR, which the driver varies)."""
    pdf = REGISTRY["gapfill_hourly_event_counts"].fn(spark, SF_DIR).toPandas()
    assert len(pdf) == pdf["hour"].nunique()
    if SF_DIR.rstrip("/").endswith("sf0.001"):
        assert (pdf["n_events"] == 0).any(), "no empty hours — gap-fill untestable here"
    else:
        # dense data: spine adds nothing, but must also lose nothing
        assert (pdf["n_events"] > 0).all() or (pdf["n_events"] == 0).any()
