"""Coverage breadth: the remaining SURVEY.md §2 operator families as named
oracle-checked queries — UDTF/explode (§2.3), string & datetime accessors
(§2.4), grouping sets (§2.6 extension), window-function breadth (§2.10
extension), monotonicity probes (§2.5), IO round-trips (§2.1), and the
rolling-hash document fingerprint (text-analysis extension).
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import davg_expr, dsum, dsum_expr, pround, pround_expr
import pandas as pd

from ..sources.tables import load_table, read_csv, read_parquet, spread, to_parquet
from ..scratch import scratch_dir
from .registry import register


# --------------------------------------------------------------------------
# Explode (the reference's only UDTF-ish op, _expr.py:1296-1306): split
# document text into words, one row per word, with position.
# --------------------------------------------------------------------------
@register(
    "explode_doc_words",
    r"""
    SELECT doc_id, CAST(u.pos AS INT) AS pos, u.word
    FROM (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
               AS words
      FROM documents WHERE trim(text) <> '' AND doc_id < 50
    ) d,
    LATERAL (SELECT unnest(generate_series(1, len(words))) - 1 AS pos,
                    unnest(words) AS word) u
    """,
)
def explode_doc_words(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.filter((F.trim("text") != "") & (F.col("doc_id") < 50))
        .select("doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "word")
    )


# --------------------------------------------------------------------------
# String accessor breadth (reference _str_accessor.py:21-183): one query
# exercising upper/lower/substr/replace/pad/contains/split-expand/length.
# --------------------------------------------------------------------------
@register(
    "str_accessor_showcase",
    """
    SELECT c_custkey,
           upper(c_name) AS uc,
           lower(c_mktsegment) AS lseg,
           substr(c_name, 1, 8) AS prefix8,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS zfilled,
           (c_mktsegment LIKE '%ING%') AS has_ing,
           length(c_name) AS name_len,
           string_split(c_name, '#')[1] AS split_head,
           concat(c_mktsegment, '|', CAST(c_nationkey AS VARCHAR)) AS joined
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def str_accessor_showcase(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.upper("c_name").alias("uc"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("zfilled"),
        F.col("c_mktsegment").contains("ING").alias("has_ing"),
        F.length("c_name").alias("name_len"),
        F.split("c_name", "#").getItem(0).alias("split_head"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("joined"),
    )


# --------------------------------------------------------------------------
# Datetime accessor breadth (reference _datetime.py:15-72).
# --------------------------------------------------------------------------
@register(
    "dt_accessor_showcase",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           STRFTIME(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           STRFTIME(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def dt_accessor_showcase(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        # pandas dayofweek is Mon=0; SQL dow is Sun=0 — expose SQL's (doc'd)
        (F.dayofweek(d) - 1).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


# --------------------------------------------------------------------------
# Grouping sets (cube/rollup sibling — absent in reference, free in Spark).
# --------------------------------------------------------------------------
@register(
    "grouping_sets_status_year",
    f"""
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {dsum_expr('o_totalprice')} AS total,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (CAST(year(o_orderdate) AS BIGINT)))
    """,
)
def grouping_sets_status_year(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    o = o.withColumn("o_year", F.year("o_orderdate").cast("bigint"))
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_year,
               ((CAST(floor(CAST((SUM(CAST(o_totalprice AS DECIMAL(30,8)))) * 100000000 AS DECIMAL(38,0)) / 4294967296) AS DOUBLE) * 4294967296.0 + CAST(CAST((SUM(CAST(o_totalprice AS DECIMAL(30,8)))) * 100000000 AS DECIMAL(38,0)) - floor(CAST((SUM(CAST(o_totalprice AS DECIMAL(30,8)))) * 100000000 AS DECIMAL(38,0)) / 4294967296) * 4294967296 AS DOUBLE)) / 100000000.0) AS total,
               COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_year))
        """
    )


# --------------------------------------------------------------------------
# Window-function breadth: lead / first_value / last_value / ntile /
# percent_rank over per-customer order sequences.
# --------------------------------------------------------------------------
@register(
    "window_fn_breadth",
    """
    SELECT o_orderkey, o_custkey,
           lead(o_totalprice, 1) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           ntile(4) OVER w AS quartile,
           (CAST(floor(percent_rank() OVER w * 1000000.0 + 0.5) AS DOUBLE)
             / 1000000.0) AS pct_rank
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_fn_breadth(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# --------------------------------------------------------------------------
# IsMonotonic (reference _reductions.py:1208-1217): per-user check that
# event values never decrease in time order.
# --------------------------------------------------------------------------
@register(
    "monotonic_user_events",
    """
    WITH flags AS (
      SELECT user_id,
             CASE WHEN ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS inc
      FROM events
    )
    SELECT user_id,
           (MIN(inc) = 1) AS ts_strictly_increasing,
           COUNT(*) AS n_events
    FROM flags
    GROUP BY user_id
    """,
)
def monotonic_user_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    inc = F.when(
        F.lag("ts").over(w).isNull() | (F.col("ts") > F.lag("ts").over(w)), 1
    ).otherwise(0)
    return (
        e.select("user_id", inc.alias("inc"))
        .groupBy("user_id")
        .agg(
            (F.min("inc") == 1).alias("ts_strictly_increasing"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# IO round-trips (§2.1 ReadCSV / ToParquet / ReadParquet): write the nation
# dim through each format, read it back, aggregate — proves the connector
# path end-to-end inside one oracle-checked query.
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# Synthetic timeseries source (reference Timeseries, datasets.py:13-241).
# Hash-derived generator (md5 of seed:row → exact dyadic uniforms), so the
# oracle reproduces the stream bit-for-bit in DuckDB: x values are j/2^31
# (31-bit mantissas), partial sums of 100k of them stay exact in a double,
# so SUM(x)/COUNT(*) is order-independent and engine-independent.
# --------------------------------------------------------------------------
def _ts_u32_sql(h_sql: str, slot: int) -> str:
    """DuckDB arithmetic for Spark's conv(substr(md5,8*slot+1,8),16,10):
    parse 8 hex chars into a 32-bit integer via strpos positions."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({h_sql}, {8 * slot + i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )


def _ts_oracle_sql() -> str:
    from ..sources.tables import TS_NAMES

    names = "[" + ", ".join(f"'{n}'" for n in TS_NAMES) + "]"
    ha = "md5(concat('42a:', CAST(i AS VARCHAR)))"
    hb = "md5(concat('42b:', CAST(i AS VARCHAR)))"
    u_name = f"({_ts_u32_sql(ha, 0)} / 4294967296.0)"
    ih = (
        f"(({_ts_u32_sql(ha, 1)} + {_ts_u32_sql(ha, 2)} + {_ts_u32_sql(ha, 3)}"
        f" + {_ts_u32_sql(hb, 0)}) / 4294967296.0)"
    )
    return f"""
    WITH ts AS (
      SELECT {names}[CAST(FLOOR({u_name} * 26) AS INT) + 1] AS name,
             ({_ts_u32_sql(hb, 1)} / 2147483648.0 - 1.0) AS x,
             ({_ts_u32_sql(hb, 2)} / 2147483648.0 - 1.0) AS y
      FROM range(100000) t(i)
    )
    SELECT name, COUNT(*) AS n,
           SUM(x) / COUNT(*) AS avg_x,
           MAX(y) AS max_y
    FROM ts GROUP BY name
    """


@register("timeseries_source_agg", _ts_oracle_sql())
def timeseries_source_agg(spark, sf_dir):
    """Generate 100k rows JVM-side, aggregate per name — exercises the
    hash-derived generator path end-to-end, hash-verified vs DuckDB."""
    from ..sources.tables import timeseries

    ts = timeseries(spark, start="2024-01-01", n_rows=100_000, freq_seconds=1)
    return ts.groupBy("name").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("x") / F.count(F.lit(1))).alias("avg_x"),
        F.max("y").alias("max_y"),
    )


@register(
    "csv_roundtrip_nation",
    """
    SELECT n_regionkey, COUNT(*) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def csv_roundtrip_nation(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    d = scratch_dir("spark_graft_csv_")
    path = os.path.join(d, "nation_csv")
    n.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, header=True)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").cast("bigint").alias("key_sum"),
    )


@register(
    "parquet_roundtrip_supplier",
    f"""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           {dsum_expr('s_acctbal')} AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def parquet_roundtrip_supplier(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    d = scratch_dir("spark_graft_pq_")
    path = os.path.join(d, "supplier_pq")
    to_parquet(s, path, partition_on=["s_nationkey"])
    back = read_parquet(spark, path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dsum("s_acctbal", "total_bal"),
    )


# --------------------------------------------------------------------------
# Rolling-hash document fingerprint (winnowing-lite): polynomial rolling
# hash over char 8-grams; fingerprint = the 4 smallest distinct gram hashes
# (min-sampling).  Docs sharing a fingerprint component are near-dup
# candidates — the MOSS/winnowing building block (Schleimer et al. '03).
# --------------------------------------------------------------------------
_FP_N = 8
_FP_K = 4
_FP_B = 257
_FP_M = 1_000_000_007

# Polynomial hash written as explicit positional arithmetic so both engines
# compute the identical value: sum(code(c_i) * B^(n-1-i)) % M, with each
# power reduced mod M (B^7 < 2^57 and 8 * (M-1) * 256 < 2^63 — no overflow).
_POWS = [pow(_FP_B, _FP_N - 1 - i, _FP_M) for i in range(_FP_N)]


def _gram_hash_sql(g: str) -> str:
    terms = " + ".join(
        f"CAST(ord(substr({g}, {i + 1}, 1)) % 256 AS BIGINT) * {_POWS[i]}"
        for i in range(_FP_N)
    )
    return f"(({terms}) % {_FP_M})"


_NORM_DD = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


def _min_fingerprints_udf():
    """The 8 smallest distinct rolling-hash gram hashes per document, as a
    vectorized Arrow-batched pandas UDF (numpy sliding-window dot against
    the power vector — one int64 matmul per doc).

    Why Python here, when the repo's rule is JVM-first: this is the one
    hot path where no built-in formulation is efficient — per-gram
    ``substr`` is O(position) on UTF8 strings (O(len²)/doc, 42 s at sf1),
    and the higher-order-function rewrite (split → element_at lookups)
    is semantically right but runs on the interpreted expression path at
    ~3 200 lambda-node evaluations per doc (23 s at sf1).  The Arrow UDF
    computes the identical arithmetic (codepoint % 256, positional power
    sum mod M — exact int64, matching the oracle digit-for-digit) at
    numpy speed, and the plan stays ArrowEvalPython (the engine-wide ban
    is on row-at-a-time BatchEvalPython only).  Measured: 23 s → ~1 s at
    sf1.  Map-side pure: no shuffle, scales with executors."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    pows = np.array(_POWS, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            codes = np.fromiter((ord(c) % 256 for c in t), np.int64, count=len(t))
            if len(codes) < _FP_N:
                out.append([])
                continue
            h = (sliding_window_view(codes, _FP_N) @ pows) % _FP_M
            out.append(np.unique(h)[:_WFP_K].tolist())
        return pd.Series(out)

    return fps


@register(
    "text_fingerprint_rolling_hash",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_DD} AS t
      FROM documents WHERE len(trim(text)) >= {_FP_N}
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             {_gram_hash_sql(f"substr(t, CAST(u AS INT), {_FP_N})")} AS h
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - {_FP_N - 1} + 1)) AS u FROM norm)
    ),
    ranked AS (
      SELECT doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      FROM grams
    )
    SELECT doc_id,
           CAST(MIN(CASE WHEN rn = 1 THEN h END) AS BIGINT) AS fp1,
           CAST(MIN(CASE WHEN rn = 2 THEN h END) AS BIGINT) AS fp2,
           CAST(MIN(CASE WHEN rn = 3 THEN h END) AS BIGINT) AS fp3,
           CAST(MIN(CASE WHEN rn = 4 THEN h END) AS BIGINT) AS fp4
    FROM ranked WHERE rn <= {_FP_K}
    GROUP BY doc_id
    """,
)
def text_fingerprint_rolling_hash(spark, sf_dir):
    """Min-sampled polynomial rolling-hash fingerprint per document.

    Plan: one explode to char 8-grams with the hash computed positionally
    (JVM arithmetic, no UDF), distinct within doc, then a single groupBy
    taking the 4 smallest hashes via sort_array(collect_set)[0:4] — one
    shuffle of (doc_id, hash) pairs.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    base = d.filter(F.length(F.trim("text")) >= _FP_N).select("doc_id", norm.alias("t"))
    # fully map-side: the fingerprint is one Arrow batch pass (no explode,
    # no shuffle) — the UDF emits the sorted distinct min-hashes directly
    mins = base.select(
        "doc_id", F.slice(_min_fingerprints_udf()("t"), 1, _FP_K).alias("fps")
    ).filter(F.size("fps") > 0)
    return mins.select(
        "doc_id",
        *[F.element_at("fps", i + 1).alias(f"fp{i + 1}") for i in range(_FP_K)],
    )


# --------------------------------------------------------------------------
# String accessor edit-op breadth (reference _str_accessor.py full method
# list): center/swapcase/rfind/removeprefix/partition/translate — the
# accessor methods added for full parity, oracle-checked.
# --------------------------------------------------------------------------
@register(
    "str_accessor_edit_ops",
    """
    SELECT c_custkey,
           CASE WHEN length(c_mktsegment) >= 12 THEN c_mktsegment
                ELSE repeat('*', CAST(floor((12 - length(c_mktsegment)) / 2) AS INT))
                     || c_mktsegment
                     || repeat('*', 12 - length(c_mktsegment)
                               - CAST(floor((12 - length(c_mktsegment)) / 2) AS INT))
           END AS centered,
           translate(c_name,
                     'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz') AS swapped,
           CASE WHEN strpos(reverse(c_name), '0') > 0
                THEN length(c_name) - strpos(reverse(c_name), '0')
                ELSE -1 END AS rfind0,
           CASE WHEN starts_with(c_name, 'Customer#')
                THEN substr(c_name, 10) ELSE c_name END AS noprefix,
           CASE WHEN strpos(c_name, '#') > 0
                THEN substr(c_name, 1, strpos(c_name, '#') - 1)
                ELSE c_name END AS part_before,
           CASE WHEN strpos(c_name, '#') > 0
                THEN substr(c_name, strpos(c_name, '#') + 1)
                ELSE '' END AS part_after,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS vowels_low
    FROM customer
    WHERE c_custkey <= 400
    """,
)
def str_accessor_edit_ops(spark, sf_dir):
    """The new-for-parity accessor methods, driven through the facade
    (operators/accessors.py): center, swapcase, rfind, removeprefix,
    partition, translate."""
    from ..operators import SparkFrame

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    sf = SparkFrame(c.withColumn("__index__", F.col("c_custkey")))
    name, seg = sf["c_name"], sf["c_mktsegment"]
    out = sf.assign(
        centered=seg.str.center(12, "*"),
        swapped=name.str.swapcase(),
        rfind0=name.str.rfind("0"),
        noprefix=name.str.removeprefix("Customer#"),
        vowels_low=seg.str.translate({"A": "a", "E": "e", "I": "i", "O": "o", "U": "u"}),
    ).to_spark()
    part = (
        name.str.partition("#")
        .to_spark()
        .select(
            F.col("__index__").alias("pk"),
            F.col("c_name_0").alias("part_before"),
            F.col("c_name_2").alias("part_after"),
        )
    )
    return out.join(part, out.c_custkey == part.pk).select(
        "c_custkey", "centered", "swapped", "rfind0",
        "noprefix", "part_before", "part_after", "vowels_low",
    )


# --------------------------------------------------------------------------
# Datetime accessor calendar-edge breadth (reference _datetime.py property
# list): days_in_month, quarter/year boundaries, leap years, weekday.
# --------------------------------------------------------------------------
@register(
    "dt_accessor_calendar_edges",
    """
    SELECT o_orderkey,
           CAST(day(last_day(o_orderdate)) AS INT) AS dim,
           (month(o_orderdate) % 3 = 1 AND day(o_orderdate) = 1) AS q_start,
           (month(o_orderdate) % 3 = 0
            AND o_orderdate = last_day(o_orderdate)) AS q_end,
           (month(o_orderdate) = 1 AND day(o_orderdate) = 1) AS y_start,
           (month(o_orderdate) = 12 AND day(o_orderdate) = 31) AS y_end,
           ((year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
            OR year(o_orderdate) % 400 = 0) AS leap,
           CAST((dayofweek(o_orderdate) + 6) % 7 AS INT) AS wd
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def dt_accessor_calendar_edges(spark, sf_dir):
    """Facade-driven: dt.days_in_month / is_quarter_* / is_year_* /
    is_leap_year / weekday (pandas Mon=0 convention on both sides)."""
    from ..operators import SparkFrame

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    sf = SparkFrame(o.withColumn("__index__", F.col("o_orderkey")))
    d = sf["o_orderdate"]
    out = sf.assign(
        dim=d.dt.days_in_month,
        q_start=d.dt.is_quarter_start,
        q_end=d.dt.is_quarter_end,
        y_start=d.dt.is_year_start,
        y_end=d.dt.is_year_end,
        leap=d.dt.is_leap_year,
        wd=d.dt.weekday,
    )
    return out.to_spark().select(
        "o_orderkey", "dim", "q_start", "q_end", "y_start", "y_end", "leap", "wd"
    )


# --------------------------------------------------------------------------
# Cumulative product (reference CumProd, _cumulative.py:9-116): windowed
# product per order over line numbers — integer-exact on both engines.
# --------------------------------------------------------------------------
@register(
    "cumprod_linenumbers",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(product(l_linenumber) OVER (
                PARTITION BY l_orderkey ORDER BY l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_prod
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def cumprod_linenumbers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.product("l_linenumber").over(w).cast("bigint").alias("running_prod"),
    )


# --------------------------------------------------------------------------
# Winnowing/MOSS fingerprint dedup (Schleimer et al. '03): documents
# sharing >= 2 of their 8 min-sampled gram hashes are near-dup pairs.
# The sixth dedup strategy (exact / MinHash-LSH / SimHash / n-gram
# Jaccard / embedding-LSH / winnowing): unlike MinHash banding, the
# candidate index here is the fingerprints THEMSELVES — 8 longs per doc,
# the inverted-index shape MOSS uses for plagiarism detection.
#
# Scale posture: the posting relation is docs × 8 rows of (hash, doc_id);
# the pair join is the classic inverted-index self-join with per-hash
# fan-out = posting-list².  A min-sampled fingerprint of a LOW-ENTROPY
# corpus is dominated by globally-common grams (the sf1 rehearsal measured
# 4.09M pairs / 54.8 s from 50k docs before this cap), so hashes whose
# posting list exceeds _WFP_CAP docs are dropped as boilerplate — the
# standard stop-shingle filter of the dedup literature, and the same
# bounded-bucket guarantee as the embedding-LSH cap: join work
# ≤ n_hashes × cap².  A hash shared by >64 docs carries no pair-level
# near-dup signal (it pairs everything with everything); cross-doc
# boilerplate is the job of boilerplate_gram_stats, not this query.
# --------------------------------------------------------------------------
_WFP_K = 8
_WFP_CAP = 64


@register(
    "dedup_winnowing_fingerprints",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_DD} AS t
      FROM documents WHERE len(trim(text)) >= {_FP_N}
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             {_gram_hash_sql(f"substr(t, CAST(u AS INT), {_FP_N})")} AS h
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - {_FP_N - 1} + 1)) AS u FROM norm)
    ),
    ranked AS (
      SELECT doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      FROM grams
    ),
    posting0 AS (SELECT doc_id, h FROM ranked WHERE rn <= {_WFP_K}),
    rare AS (
      SELECT h FROM posting0 GROUP BY h HAVING COUNT(*) <= {_WFP_CAP}
    ),
    posting AS (SELECT p.doc_id, p.h FROM posting0 p JOIN rare r ON p.h = r.h)
    SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared_fps
    FROM posting a JOIN posting b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def dedup_winnowing_fingerprints(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    base = d.filter(F.length(F.trim("text")) >= _FP_N).select("doc_id", norm.alias("t"))
    # fingerprints are one Arrow batch pass (see _min_fingerprints_udf) —
    # the only exploded relation is the k-row-per-doc posting list
    posting = base.select(
        "doc_id", _min_fingerprints_udf()("t").alias("fps")
    ).select("doc_id", F.explode("fps").alias("h"))
    from .registry import cache_scoped

    posting = cache_scoped(posting)
    # stop-shingle filter: drop boilerplate fingerprints before the
    # self-join so per-hash fan-out is bounded by _WFP_CAP² (sf1 lesson)
    rare = (
        posting.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__pc__"))
        .filter(F.col("__pc__") <= _WFP_CAP)
        .select("h")
    )
    posting = posting.join(rare.hint("shuffle_hash"), ["h"])
    a = posting.select(F.col("doc_id").alias("id1"), "h")
    b = posting.select(F.col("doc_id").alias("id2"), "h")
    # posting lists scale with real duplication — pin the self-join to
    # shuffle so AQE can never promote a corpus-derived side to broadcast
    return (
        a.join(b.hint("shuffle_hash"), ["h"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= 2)
    )


# --------------------------------------------------------------------------
# Winnowing pair graph → duplicate clusters: same composition as the
# MinHash/SimHash cluster pipelines (pairs → distributed min-label CC →
# per-component rollup), proving the CC operator composes over every pair
# generator.  Oracle = recursive-CTE reachability over the identical pair
# SQL.
# --------------------------------------------------------------------------
from .registry import REGISTRY as _REG  # noqa: E402

_WINNOW_PAIRS_SQL = _REG["dedup_winnowing_fingerprints"].sql

_WINNOW_CC_SQL = f"""
    WITH RECURSIVE pairs AS ({_WINNOW_PAIRS_SQL}),
    edges AS (SELECT id1 AS a, id2 AS b FROM pairs
              UNION ALL SELECT id2, id1 FROM pairs),
    cc_nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM cc_nodes
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ),
    labels AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*) AS n_members
    FROM labels GROUP BY component
"""


@register("dedup_winnowing_components", _WINNOW_CC_SQL)
def dedup_winnowing_components(spark, sf_dir):
    from ..operators.graph import connected_components

    pairs = dedup_winnowing_fingerprints(spark, sf_dir)
    labels = connected_components(pairs, src="id1", dst="id2")
    return labels.groupBy(F.col("comp").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


# --------------------------------------------------------------------------
# Graph analytics over the dup-pair graph: triangle count + global
# clustering coefficient.  Composes over the winnowing pair generator the
# same way CC does — evidence the pair graphs are first-class relations,
# not dead ends.  Triangle enumeration is the canonical ordered 3-join
# (a<b<c so each triangle counts once); wedges from per-node degrees.
#
# Scale posture: edge lists here are already stop-shingle-capped (join
# work ≤ n_hashes × cap²), and the triangle join is edges⋈edges on a
# node key then a 2-column edge probe — both pinned to shuffle (the
# corpus-derived-side broadcast hazard).  Degree agg is map-side
# combinable.  All integer arithmetic; the only double is the final
# ratio (wedge sums are exact integers < 2^53).
# --------------------------------------------------------------------------
_TRI_SQL = f"""
    WITH pairs AS ({_WINNOW_PAIRS_SQL}),
    edges AS (SELECT id1 AS a, id2 AS b FROM pairs),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT id1 AS node FROM pairs
        UNION ALL SELECT id2 FROM pairs) GROUP BY node
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    wstats AS (
      SELECT COUNT(*) AS n_nodes,
             CAST(CAST(SUM(d * (d - 1)) AS BIGINT) / 2 AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT w.n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           t.n_triangles,
           w.n_wedges,
           CASE WHEN w.n_wedges > 0 THEN
             {pround_expr('3.0 * CAST(t.n_triangles AS DOUBLE) / CAST(w.n_wedges AS DOUBLE)', 6)}
           END AS global_clustering
    FROM tri t, wstats w
"""


@register("graph_triangle_stats", _TRI_SQL)
def graph_triangle_stats(spark, sf_dir):
    """Triangle count, wedge count, and global clustering coefficient of
    the winnowing near-dup pair graph (a dup cluster of k docs is a
    k-clique — its C(k,3) triangles vs C(k,2)-per-node wedges measure how
    clique-like the duplication structure is)."""
    from .registry import cache_scoped

    pairs = cache_scoped(
        dedup_winnowing_fingerprints(spark, sf_dir).select("id1", "id2")
    )
    edges = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    deg = (
        pairs.select(F.col("id1").alias("node"))
        .unionAll(pairs.select(F.col("id2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    wedges_open = e1.join(e2.hint("shuffle_hash"), "b")
    tri = wedges_open.join(
        e3.hint("shuffle_hash"),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    wstats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)).cast("double") / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    out = wstats.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))
    clustering = F.when(
        F.col("n_wedges") > 0,
        pround(
            3.0 * F.col("n_triangles").cast("double") / F.col("n_wedges").cast("double"),
            6,
        ),
    )
    return out.select(
        "n_nodes", "n_edges", "n_triangles", "n_wedges",
        clustering.alias("global_clustering"),
    )
