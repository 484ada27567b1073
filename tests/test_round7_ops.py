"""Round-7 operator invariants beyond the DuckDB-oracle compare:
structural properties that must hold at ANY scale (the oracle only
witnesses one dataset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_expr_rapids_spark.queries import REGISTRY
from dask_expr_rapids_spark.queries.registry import release_caches

from .conftest import SF_DIR


def test_kmeans_clusters_partition_the_corpus(spark):
    """Every vector lands in exactly one cluster: sum of n_members equals
    the corpus size, cluster ids are within [0, K), inertia >= 0."""
    out = REGISTRY["kmeans_embedding_clusters"].fn(spark, SF_DIR).collect()
    release_caches()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in out) == n_vecs
    assert all(0 <= r["cid"] < 4 for r in out)
    assert all(r["inertia"] >= 0.0 for r in out)


def test_pagerank_mass_is_conserved_and_deterministic(spark):
    """With 3 damped iterations the total rank mass stays within the
    damping leak bound of the 1e12 budget (floor-division only loses
    mass, never creates it), and two runs give identical top-k (the
    integer pipeline has no shuffle-order sensitivity)."""
    from dask_expr_rapids_spark.queries.graphrank import _PR_MASS

    fn = REGISTRY["pagerank_word_centrality"].fn
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    release_caches()
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    release_caches()
    assert a == b
    assert all(0 < rank <= _PR_MASS for _, rank in a)
    # descending with deterministic word tiebreak
    assert a == sorted(a, key=lambda t: (-t[1], t[0]))


def test_zipf_topk_is_take_ordered(spark):
    """The top-R vocabulary selection must plan as TakeOrderedAndProject —
    never a global sort of the full vocabulary."""
    from dask_expr_rapids_spark.plans import plan_of

    df = REGISTRY["zipf_fit_vocabulary"].fn(spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan_of(df, "simple")
    release_caches()


def test_leakage_safe_split_never_divides_a_cluster(spark):
    """Directly verify the structural guarantee on the doc-level
    assignment: no exact-dedup cluster spans two splits."""
    from dask_expr_rapids_spark.functions.text import fingerprint
    from dask_expr_rapids_spark.operators.sampling import hash_uniform
    from pyspark.sql import Window as W

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = W.partitionBy(fingerprint(F.col("text")))
    canon = d.select("doc_id", F.min("doc_id").over(w).alias("canon"))
    u = hash_uniform(F.col("canon"))
    split = F.when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test")
    per_cluster = (
        canon.select("canon", split.alias("split"))
        .groupBy("canon")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert per_cluster.filter(F.col("k") > 1).count() == 0


def test_bloom_semijoin_no_false_negatives(spark):
    """Bloom guarantee: every member passes (FN = 0 structurally); the
    FP audit columns are consistent (pass = member + false_pos) and the
    deliberately-tight filter keeps FP below saturation."""
    out = REGISTRY["bloom_semijoin_orders"].fn(spark, SF_DIR).collect()
    release_caches()
    assert sum(r["n_false_neg"] for r in out) == 0
    for r in out:
        assert r["n_pass"] == r["n_member"] + r["n_false_pos"]
        assert 0 <= r["n_false_pos"] <= r["n_orders"] - r["n_member"]
    n_non_member = sum(r["n_orders"] - r["n_member"] for r in out)
    n_fp = sum(r["n_false_pos"] for r in out)
    assert n_fp / max(n_non_member, 1) < 0.5  # tight m, but not saturated


def test_sessionize_batch_partitions_every_event(spark):
    """Sessions partition the event stream: per-session counts sum to the
    table size, durations are non-negative, indices start at 1."""
    out = REGISTRY["sessionize_users_batch"].fn(spark, SF_DIR).collect()
    release_caches()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n_events"] for r in out) == n_events
    assert all(r["dur_us"] >= 0 for r in out)
    assert min(r["session_idx"] for r in out) == 1


def test_peak_concurrency_matches_global_sweep(spark):
    """The day-partitioned sweep (carry + per-day running sum) equals the
    single global sweep it replaces, day by day."""
    from dask_expr_rapids_spark.queries.analytics import _DAY_US

    sessions = (
        REGISTRY["sessionize_users_batch"].fn(spark, SF_DIR).toPandas()
    )
    out = {
        r["day"]: r["peak_concurrency"]
        for r in REGISTRY["peak_concurrency_daily"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    import collections
    import datetime

    deltas = collections.Counter()
    # a session is open through its last event's microsecond: [s, s+dur+1)
    for s, d in zip(sessions["start_us"], sessions["dur_us"]):
        deltas[int(s)] += 1
        deltas[int(s + d + 1)] -= 1
    running = 0
    day_peak: dict[int, int] = {}
    prev_day = None
    for ts in sorted(deltas):
        day = ts // _DAY_US
        if day != prev_day:
            # concurrency at day start (the carry) seeds each new day's peak
            for dd in range(prev_day + 1 if prev_day is not None else day, day + 1):
                day_peak[dd] = max(day_peak.get(dd, 0), running)
            prev_day = day
        running += deltas[ts]
        day_peak[day] = max(day_peak[day], running)
    expect = {
        datetime.date(1970, 1, 1) + datetime.timedelta(days=d): p
        for d, p in day_peak.items()
        if p > 0
    }
    got = {datetime.date.fromisoformat(k): v for k, v in out.items()}
    assert got == expect, {
        d: (got.get(d), expect.get(d))
        for d in set(got) | set(expect)
        if got.get(d) != expect.get(d)
    }


def test_hll_set_ops_inclusion_exclusion(spark):
    """The intersection row is EXACTLY a + b - union in both the exact
    and estimated columns, and every estimate is within 50% of exact
    (m=256 keeps sigma ~6.5%)."""
    rows = {
        r["set_name"]: r
        for r in REGISTRY["hll_set_ops_users"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    a, b, u, i = (rows[k] for k in ("click", "purchase", "union", "intersection"))
    assert i["n_exact"] == a["n_exact"] + b["n_exact"] - u["n_exact"]
    assert u["n_exact"] >= max(a["n_exact"], b["n_exact"])
    assert abs(i["n_est"] - (a["n_est"] + b["n_est"] - u["n_est"])) < 1e-3
    for r in (a, b, u):
        assert abs(r["rel_err"]) < 0.5


def test_dq_report_shape_and_fk_green(spark):
    """Seven checks, every n_checked positive, ok == (n_bad == 0), and
    the synthetic tables' referential integrity actually holds."""
    out = {r["check_name"]: r for r in REGISTRY["dq_validation_report"].fn(spark, SF_DIR).collect()}
    release_caches()
    assert len(out) == 7
    for r in out.values():
        assert r["n_checked"] > 0
        assert r["ok"] == (r["n_bad"] == 0)
    assert out["fk_orders_custkey"]["n_bad"] == 0
    assert out["fk_lineitem_orderkey"]["n_bad"] == 0
    assert out["unique_o_orderkey"]["n_bad"] == 0


def test_twa_bounded_by_day_extremes(spark):
    """The time-weighted average of a (type, day) lies within that
    group's [min, max] value envelope (a convex combination of held
    values), and n_events partitions the table."""
    out = REGISTRY["time_weighted_avg_daily"].fn(spark, SF_DIR).collect()
    release_caches()
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            "event_type",
            F.to_date("ts").cast("string").alias("day"),
            F.col("value").cast("double").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    env = {(r["event_type"], r["day"]): r for r in ev}
    assert sum(r["n_events"] for r in out) == sum(r["n"] for r in ev)
    for r in out:
        e = env[(r["event_type"], r["day"])]
        assert e["lo"] - 1e-6 <= r["twa"] <= e["hi"] + 1e-6, (r, e)


def test_markov_transitions_count_and_rows(spark):
    """Each user with n events contributes n-1 transitions, and per-cur
    floor probabilities sum into (1e6 - branching, 1e6]."""
    out = REGISTRY["markov_event_transitions"].fn(spark, SF_DIR).collect()
    release_caches()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in out) == n_events - n_users
    import collections

    psum = collections.Counter()
    branch = collections.Counter()
    for r in out:
        psum[r["cur_type"]] += r["p_micro"]
        branch[r["cur_type"]] += 1
    for cur, s in psum.items():
        assert 1_000_000 - branch[cur] < s <= 1_000_000, (cur, s)


def test_knn_matches_numpy_oracle(spark):
    """The k-NN vote (quantized cosine, (votes DESC, best_rank, label)
    tiebreak) reproduced independently in numpy."""
    out = {
        r["qid"]: (r["pred_label"], r["n_votes"], r["best_rank"])
        for r in REGISTRY["knn_label_classifier"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    import numpy as np
    import pandas as pd

    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = np.array(
        [np.round(np.asarray(v, dtype=np.float64) * 1e6) for v in df["embedding"]]
    )
    labels = df["label"].to_numpy()
    vec_ids = df["vec_id"].to_numpy()
    train = vec_ids >= 5
    for qid in range(5):
        qi = np.where(vec_ids == qid)[0][0]
        dots = q[train] @ q[qi]
        cos = dots / (np.linalg.norm(q[train], axis=1) * np.linalg.norm(q[qi]))
        nids = vec_ids[train]
        order = np.lexsort((nids, -cos))[:10]
        votes = {}
        for rank, idx in enumerate(order, start=1):
            lab = int(labels[train][idx])
            c, br = votes.get(lab, (0, rank))
            votes[lab] = (c + 1, min(br, rank))
        pred = sorted(votes.items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0]))[0]
        assert out[qid] == (pred[0], pred[1][0], pred[1][1]), (qid, out[qid], pred)


def test_bfs_matches_python_oracle(spark):
    """Frontier sizes per hop match a plain-Python BFS over the same
    distinct-bigram graph."""
    out = {r["hop"]: r["n_nodes"] for r in REGISTRY["bfs_khop_word_graph"].fn(spark, SF_DIR).collect()}
    release_caches()
    import collections
    import re

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    adj = collections.defaultdict(set)
    for t in docs["text"]:
        if not t or not t.strip():
            continue
        ws = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        for a, b in zip(ws, ws[1:]):
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
    seed = sorted(adj, key=lambda w: (-len(adj[w]), w))[0]
    visited = {seed}
    frontier = {seed}
    expect = {0: 1}
    for hop in (1, 2, 3):
        frontier = {b for a in frontier for b in adj[a]} - visited
        visited |= frontier
        expect[hop] = len(frontier)
    assert out == expect, (out, expect)


def test_stream_bloom_no_false_negatives(spark):
    """The streamed filter admits every member (FN = 0) and the audit
    columns are internally consistent."""
    out = REGISTRY["stream_bloom_purchaser_filter"].fn(spark, SF_DIR).collect()
    release_caches()
    assert sum(r["n_false_neg"] for r in out) == 0
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n_events"] for r in out) == n_events
    for r in out:
        assert r["n_pass"] == r["n_member"] + r["n_false_pos"]


def test_hopping_windows_cover_each_event_four_times(spark):
    """1-h windows hopping every 15 min: every event lands in exactly 4
    windows, and each window mean sits inside the global value range."""
    out = REGISTRY["hopping_window_event_rates"].fn(spark, SF_DIR).collect()
    release_caches()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    assert sum(r["n_events"] for r in out) == 4 * n
    assert all(lo - 1e-6 <= r["avg_value"] <= hi + 1e-6 for r in out)


def test_session_conversion_consistent_with_sessionizer(spark):
    """Daily session counts sum to the sessionizer's session count;
    conversion counts and rates are internally consistent."""
    out = REGISTRY["session_conversion_daily"].fn(spark, SF_DIR).collect()
    n_sessions = REGISTRY["sessionize_users_batch"].fn(spark, SF_DIR).count()
    release_caches()
    assert sum(r["n_sessions"] for r in out) == n_sessions
    for r in out:
        assert 0 <= r["n_converted"] <= r["n_sessions"]
        assert r["conv_rate_micro"] == (r["n_converted"] * 1_000_000) // r["n_sessions"]
        assert r["avg_dur_s"] >= 0.0


def test_checksum_diff_flags_exactly_the_edited_buckets(spark):
    """Diverged buckets are exactly the synthesized edits: every 37th
    bucket (prices bumped, counts equal -> content_drift) plus bucket 999
    (rows deleted -> count_drift)."""
    out = {r["bucket"]: r for r in REGISTRY["partition_checksum_diff_orders"].fn(spark, SF_DIR).collect()}
    release_caches()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        (F.col("o_orderkey") % 1024).alias("b")
    )
    present = {r["b"] for r in o.distinct().collect()}
    expect = {b for b in present if b % 37 == 5} | ({999} if 999 in present else set())
    assert set(out) == expect, (sorted(out), sorted(expect))
    for b, r in out.items():
        if b == 999:
            assert r["reason"] == "count_drift" and r["n_v2"] < r["n_v1"]
        else:
            assert r["reason"] == "content_drift" and r["n_v1"] == r["n_v2"]


def test_entropy_profile_bounds(spark):
    """0 <= H <= log2(cardinality) for every profiled column, and row
    counts match the source tables."""
    import math

    out = {r["column_name"]: r for r in REGISTRY["column_entropy_profile"].fn(spark, SF_DIR).collect()}
    release_caches()
    assert len(out) == 4
    for name, r in out.items():
        table = name.split(".")[0]
        n = spark.read.parquet(f"{SF_DIR}/{table}.parquet").count()
        assert r["n_rows"] == n
        assert -1e-9 <= r["entropy_bits"] <= math.log2(max(r["n_distinct"], 2)) + 1e-9


def test_stream_session_conversion_matches_batch(spark):
    """The streamed session-conversion rollup equals the batch endpoint
    on the shared columns (session_window == gaps-and-islands)."""
    got = {
        r["day"]: (r["n_sessions"], r["n_converted"], r["conv_rate_micro"])
        for r in REGISTRY["stream_session_conversion_daily"].fn(spark, SF_DIR).collect()
    }
    expect = {
        r["day"]: (r["n_sessions"], r["n_converted"], r["conv_rate_micro"])
        for r in REGISTRY["session_conversion_daily"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    assert got == expect


def test_keywords_respect_df_gate_and_ordering(spark):
    """5 keywords per source, scores non-increasing with the (score,
    word) tiebreak, and no keyword's document frequency reaches the 30%
    boilerplate gate."""
    out = REGISTRY["keyword_extraction_by_source"].fn(spark, SF_DIR).collect()
    release_caches()
    import collections
    import re

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    df = collections.Counter()
    n_docs = 0
    for t in docs["text"]:
        if not t or not t.strip():
            continue
        n_docs += 1
        for w in set(re.sub(r"\s+", " ", t.strip().lower()).split(" ")):
            df[w] += 1
    per_source = collections.defaultdict(list)
    for r in out:
        per_source[r["source"]].append((r["score"], r["word"]))
        assert df[r["word"]] * 10 < n_docs * 3, (r["word"], df[r["word"]], n_docs)
        assert r["idf_micro"] > 0 and r["tf"] > 0
    for source, rows in per_source.items():
        # up to 5: a source may have fewer gate-passing words at small SF
        assert 1 <= len(rows) <= 5
        ranked = sorted(rows, key=lambda t: (-t[0], t[1]))
        assert rows == ranked, (source, rows)


def test_key_skew_report_consistent(spark):
    """Row counts match the tables, the hottest key's count is the max,
    and skew_ratio >= 1 (max >= mean) for every key."""
    out = {r["key_name"]: r for r in REGISTRY["key_skew_report"].fn(spark, SF_DIR).collect()}
    release_caches()
    assert set(out) == {"orders.o_custkey", "lineitem.l_suppkey", "events.user_id"}
    for name, r in out.items():
        table, col = name.split(".")
        t = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        assert r["n_rows"] == t.count()
        top_n = t.filter(F.col(col).cast("string") == r["top_key"]).count()
        assert top_n == r["max_count"]
        assert r["skew_ratio"] >= 1.0


def test_anomaly_flags_roll_up_to_outlier_totals(spark):
    """Per-day anomaly counts sum to robust_outliers_by_type's per-type
    totals (same median/MAD, same test)."""
    daily = REGISTRY["robust_anomaly_flags_daily"].fn(spark, SF_DIR).collect()
    totals = {
        r["event_type"]: (r["n"], r["n_outliers"])
        for r in REGISTRY["robust_outliers_by_type"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    import collections

    per_type = collections.Counter()
    per_type_anom = collections.Counter()
    for r in daily:
        per_type[r["event_type"]] += r["n_events"]
        per_type_anom[r["event_type"]] += r["n_anomalies"]
    for t, (n, n_out) in totals.items():
        assert per_type[t] == n, t
        assert per_type_anom[t] == n_out, t


def test_mutual_information_matches_numpy(spark):
    """MI(event_type; dow) reproduced independently in pandas/numpy to
    within the 1e-9 term-quantization tolerance, and 0 <= MI."""
    r = REGISTRY["mutual_information_event_dow"].fn(spark, SF_DIR).first()
    release_caches()
    import math

    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    joint = pd.crosstab(ev["event_type"], ts.dt.dayofweek)
    n = joint.to_numpy().sum()
    mi = 0.0
    cells = 0
    for x in joint.index:
        for y in joint.columns:
            cxy = int(joint.loc[x, y])
            if cxy == 0:
                continue
            cells += 1
            mi += (cxy / n) * math.log(cxy * n / (joint.loc[x].sum() * joint[y].sum())) / math.log(2)
    assert r["n_rows"] == n and r["n_cells"] == cells
    assert r["mi_bits"] >= -1e-6
    assert abs(r["mi_bits"] - mi) < 1e-4, (r["mi_bits"], mi)


def test_gini_matches_python_oracle(spark):
    """Per-segment Gini equals the plain-Python rank-form computation on
    exact cents, and sits in [0, 1)."""
    out = {r["segment"]: r for r in REGISTRY["gini_spend_by_segment"].fn(spark, SF_DIR).collect()}
    release_caches()
    import math

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    spend = o.groupby(["c_mktsegment", "o_custkey"])["cents"].sum().reset_index()
    for seg, g in spend.groupby("c_mktsegment"):
        xs = sorted(g["cents"])
        n = len(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        gini = num / (n * sum(xs))
        r = out[seg]
        assert r["n_customers"] == n and r["total_cents"] == sum(xs)
        assert 0.0 <= r["gini"] < 1.0
        assert abs(r["gini"] - gini) < 1e-6, (seg, r["gini"], gini)


def test_time_to_convert_matches_python_oracle(spark):
    """Per-day converting counts and lower-median latency reproduced in
    plain Python from the raw events."""
    out = {r["day"]: r for r in REGISTRY["funnel_time_to_convert_daily"].fn(spark, SF_DIR).collect()}
    release_caches()
    import collections

    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["event_type"].isin(["view", "purchase"])]
    ev["us"] = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64") // 1000
    )
    t1 = ev[ev["event_type"] == "view"].groupby("user_id")["us"].min()
    per_day = collections.defaultdict(list)
    pur = ev[ev["event_type"] == "purchase"]
    for uid, first_view in t1.items():
        later = pur[(pur["user_id"] == uid) & (pur["us"] > first_view)]["us"]
        if len(later):
            day = pd.Timestamp(first_view * 1000, unit="ns").date().isoformat()
            per_day[day].append(int(later.min() - first_view))
    assert set(out) == set(per_day)
    for day, ds in per_day.items():
        ds.sort()
        r = out[day]
        assert r["n_converted"] == len(ds)
        assert r["median_delta_us"] == ds[(len(ds) + 1) // 2 - 1], day


def test_grouped_lower_median_selection_path_is_exact(spark):
    """The round-8 scale rewrite: the histogram-bucketed distributed
    selection must return BIT-IDENTICAL lower medians to the window
    formulation (the value at rank (n+1) div 2 of a sorted multiset is
    tie-order-independent), including on shifted/negative inputs."""
    from dask_expr_rapids_spark.operators.selection import grouped_lower_median
    from dask_expr_rapids_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events").select("event_type", "value")
    for df, col in (
        (e, "value"),
        (e.select("event_type", (F.col("value") - 100.0).alias("v")), "v"),
    ):
        w = {
            r["event_type"]: r["m"]
            for r in grouped_lower_median(
                df, "event_type", col, "m", force="window"
            ).collect()
        }
        s = {
            r["event_type"]: r["m"]
            for r in grouped_lower_median(
                df, "event_type", col, "m", force="selection"
            ).collect()
        }
        assert w == s and len(w) == 5


def test_robust_queries_selection_path_matches_oracle(spark, oracle):
    """Force the scale path through the full robust queries (the bytes
    gate keeps bench-scale plans on the window form, so the selection
    form needs its own differential run against the DuckDB oracle)."""
    from dask_expr_rapids_spark.operators import selection

    from .conftest import SF_DIR as _SF, assert_matches_oracle

    orig = selection.DEFAULT_PATH_B_BYTES
    selection.DEFAULT_PATH_B_BYTES = 0  # force selection everywhere
    try:
        for name in ("robust_outliers_by_type", "robust_anomaly_flags_daily"):
            q = REGISTRY[name]
            assert_matches_oracle(q.fn(spark, _SF), oracle, q.sql, name)
            release_caches()
    finally:
        selection.DEFAULT_PATH_B_BYTES = orig


def test_grouped_lower_median_null_nan_parity(spark):
    """Round-8 review fix: the selection path must match the window
    path's NULL/NaN semantics (ascending sort = NULLs first, NaN last):
    a majority-NULL group yields a NULL median (not a missing row) and a
    NaN-majority group yields NaN, from BOTH paths."""
    import math

    from pyspark.sql import Row

    from dask_expr_rapids_spark.operators.selection import grouped_lower_median

    rows = []
    for i in range(10):
        rows.append(Row(g="A", v=None if i < 6 else float(i)))
    for i in range(10):
        rows.append(Row(g="B", v=float("nan") if i >= 4 else float(i)))
    for i in range(11):
        rows.append(Row(g="C", v=float(i)))
    df = spark.createDataFrame(rows, "g string, v double")

    def norm(x):
        return "nan" if (x is not None and isinstance(x, float) and math.isnan(x)) else x

    results = {}
    for force in ("window", "selection"):
        got = {
            r["g"]: norm(r["m"])
            for r in grouped_lower_median(df, "g", "v", "m", force=force).collect()
        }
        results[force] = got
    assert results["window"] == results["selection"]
    assert results["window"] == {"A": None, "B": "nan", "C": 5.0}


def test_grouped_lower_median_huge_finite_values_stay_below_nan(spark):
    """Round-8 ADVICE fix: floor(v*1024) for v >= ~4.5e15 would pass the
    1<<62 NaN sentinel (and a double->long cast saturates at Long.MAX),
    letting a huge finite value out-order NaN in the selection path's
    bucket space.  The clamp pins every finite value into the top finite
    bucket, so both paths still agree that NaN sorts LAST over the full
    double range."""
    import math

    from pyspark.sql import Row

    from dask_expr_rapids_spark.operators.selection import grouped_lower_median

    rows = [
        # median straddles the clamp region: 3 huge finite + 2 NaN means
        # lower median (rank 3 of 5) is the largest huge finite value
        Row(g="H", v=5.0e15),
        Row(g="H", v=1.0e100),
        Row(g="H", v=1.7e308),
        Row(g="H", v=float("nan")),
        Row(g="H", v=float("nan")),
        # all-huge group: per-value pick inside the single clamped bucket
        Row(g="G", v=4.6e15),
        Row(g="G", v=9.9e200),
        Row(g="G", v=1.0e300),
    ]
    df = spark.createDataFrame(rows, "g string, v double")

    def norm(x):
        return "nan" if (x is not None and math.isnan(x)) else x

    results = {}
    for force in ("window", "selection"):
        results[force] = {
            r["g"]: norm(r["m"])
            for r in grouped_lower_median(df, "g", "v", "m", force=force).collect()
        }
    assert results["window"] == results["selection"]
    assert results["window"] == {"H": 1.7e308, "G": 9.9e200}
