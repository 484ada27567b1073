"""Round-3 operator queries: lazy-scalar plan composition, the JSON
connector round-trip, streaming dedup, and a sign-LSH-bucketed ANN
variant — driver-facing oracle coverage for the surface added in round 3.

Determinism contract: the lazy-scalar threshold compares exact decimals
(price·n > Σprice, no division); ANN uses the quantized-integer cosine
shared with queries/similarity.py; the streaming dedup emits only the
deduplicated KEYS (which row of a duplicate group survives a streaming
drain is order-dependent, the key set is not).
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.frame import INDEX, SparkFrame
from ..sources.tables import load_table, read_json, spread, to_json
from ..scratch import scratch_dir
from .registry import register

_sink_counter = itertools.count()


# --------------------------------------------------------------------------
# LazyScalar composition (reference Scalar, _collection.py:1850): the
# global-mean threshold rides the plan as a broadcast cross join — ONE job,
# where eager scalar reductions run two.  Exact arithmetic: price·n > Σprice
# over DECIMAL(18,4) avoids both float-sum order dependence and cross-engine
# decimal-division scale rules.
# --------------------------------------------------------------------------
@register(
    "lazy_above_mean_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,4))
            * (SELECT COUNT(o_totalprice) FROM orders)
          > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)
    """,
)
def lazy_above_mean_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    f = SparkFrame(o)
    p = f["o_totalprice"].astype("decimal(18,4)")
    mask = (p * p.count(lazy=True)) > p.sum(lazy=True)
    return f[mask].to_spark().select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# JSON connector round-trip (Spark-native json source; reference io surface
# §2.1): write the region dim as JSON lines, read it back with an explicit
# schema (inference is a non-starter at scale), aggregate.
# --------------------------------------------------------------------------
@register(
    "json_roundtrip_region",
    """
    SELECT COUNT(*) AS n_regions,
           CAST(SUM(r_regionkey) AS BIGINT) AS key_sum,
           MIN(r_name) AS first_name
    FROM region
    """,
)
def json_roundtrip_region(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    d = scratch_dir("spark_graft_json_")
    path = os.path.join(d, "region_json")
    to_json(r, path)
    back = read_json(spark, path, schema=r.schema)
    return back.agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.sum("r_regionkey").cast("bigint").alias("key_sum"),
        F.min("r_name").alias("first_name"),
    )


# --------------------------------------------------------------------------
# Streaming dedup (dropDuplicatesWithinWatermark, streaming/ops.py): drain
# the event stream through the stateful dedup operator and emit the KEY SET
# — equal to batch SELECT DISTINCT.  Watermark bounds the state store; the
# drained key set is order-independent even though the surviving row of
# each duplicate group is not.
# --------------------------------------------------------------------------
@register(
    "stream_dedup_event_keys",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_event_keys(spark, sf_dir):
    from ..streaming.ops import read_events_stream, run_available_now, stream_dedup

    stream = read_events_stream(spark, sf_dir, glob_filter="events.parquet")
    keys = stream.select("user_id", "event_type", "ts")
    deduped = stream_dedup(keys, ["user_id", "event_type"], watermark="36500 days")
    sink = f"stream_dedup_keys_{next(_sink_counter)}"
    from .streaming import events_state_parts as _state_parts

    out = run_available_now(
        deduped, sink, output_mode="append", shuffle_partitions=_state_parts(sf_dir)
    )
    return out.select("user_id", "event_type")


# --------------------------------------------------------------------------
# Sign-LSH-bucketed ANN (the third member of the ANN family: brute force =
# exact baseline, IVF = centroid routing, LSH = data-independent routing).
# Same 8×8-bit sign bands as dedup_embedding_cosine: each probe searches
# only vectors sharing at least one band key — no centroids to maintain,
# so it works before any clustering exists (e.g. first pass over a fresh
# corpus).  Candidates are slim (qid, nid) pairs, deduped, then the exact
# quantized cosine ranks the union of the probe's buckets.
# --------------------------------------------------------------------------
_DIM = 64
_LSH_BANDS = 8
_LSH_BITS = 8
_N_QUERIES = 5
_TOPK = 5
_QELEM = "CAST(round(CAST({v}.embedding[CAST(u AS INT) + 1] AS DOUBLE) * 1000000, 0) AS BIGINT)"

_LSH_KEY_SQL = [
    "("
    + " + ".join(
        f"(CASE WHEN embedding[{b * _LSH_BITS + j + 1}] >= 0 "
        f"THEN {1 << (_LSH_BITS - 1 - j)} ELSE 0 END)"
        for j in range(_LSH_BITS)
    )
    + f") AS k{b}"
    for b in range(_LSH_BANDS)
]
_LSH_BAND_UNION_SQL = "\n      UNION ALL\n".join(
    f"      SELECT vec_id, {b} AS band, k{b} AS bkey FROM v"
    for b in range(_LSH_BANDS)
)

_ANN_LSH_SQL = f"""
    WITH v AS (SELECT vec_id, embedding, {", ".join(_LSH_KEY_SQL)} FROM embeddings),
    bands AS (
{_LSH_BAND_UNION_SQL}
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS qid, c.vec_id AS nid
      FROM bands p JOIN bands c ON p.band = c.band AND p.bkey = c.bkey
                               AND p.vec_id <> c.vec_id
      WHERE p.vec_id < {_N_QUERIES}
    ),
    norms AS (
      SELECT vec_id,
             SUM({_QELEM.format(v='e')} * {_QELEM.format(v='e')}) AS nrm2
      FROM (SELECT vec_id, embedding, unnest(range({_DIM})) AS u
            FROM embeddings) e
      GROUP BY vec_id
    ),
    dots AS (
      SELECT cd.qid, cd.nid,
             SUM({_QELEM.format(v='q')} * {_QELEM.format(v='e')}) AS dot
      FROM cand cd
      JOIN embeddings q ON q.vec_id = cd.qid
      JOIN embeddings e ON e.vec_id = cd.nid
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT d.qid, d.nid,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.nrm2 AS DOUBLE))
                                      * sqrt(CAST(ne.nrm2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms nq ON d.qid = nq.vec_id
      JOIN norms ne ON d.nid = ne.vec_id
    )
    SELECT qid, nid,
           (CAST(floor(cosine * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, nid) AS rn
          FROM sims) t
    WHERE rn <= {_TOPK}
"""


@register("ann_lsh_cosine_topk", _ANN_LSH_SQL)
def ann_lsh_cosine_topk(spark, sf_dir):
    """Sign-LSH-routed top-k: candidates from shared sign-bit buckets (8
    bands × 8 bits), exact quantized cosine over the candidate union.

    Scale shape: the banded corpus table is (8·n) slim rows joined on the
    band key against the (tiny, broadcast) banded probe set — per-probe
    work tracks bucket occupancy, never the corpus size; at 100 TB store
    the corpus bucketed by (band, bkey) so routing prunes at the scan."""
    from ..functions.exact import pround
    from ..operators.similarity import quantize

    e = spread(load_table(spark, sf_dir, "embeddings"))
    sign_key = [
        sum_bits.alias(f"k{b}")
        for b, sum_bits in (
            (
                b,
                sum(
                    F.when(
                        F.element_at("embedding", b * _LSH_BITS + j + 1) >= 0,
                        F.lit(1 << (_LSH_BITS - 1 - j)),
                    ).otherwise(F.lit(0))
                    for j in range(_LSH_BITS)
                ),
            )
            for b in range(_LSH_BANDS)
        )
    ]
    v = e.select("vec_id", "embedding", *sign_key)
    bands = None
    for b in range(_LSH_BANDS):
        part = v.select("vec_id", F.lit(b).alias("band"), F.col(f"k{b}").alias("bkey"))
        bands = part if bands is None else bands.unionByName(part)
    probes_b = bands.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), "band", "bkey"
    )
    cand = (
        bands.join(F.broadcast(probes_b), ["band", "bkey"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"))
        .distinct()
    )
    quant = e.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    norms = quant.select(
        "vec_id",
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x * x).alias("nrm2"),
    )
    qp = quant.withColumnRenamed("vec_id", "qid").withColumnRenamed("qv", "qe")
    dots = (
        cand.join(F.broadcast(qp.filter(F.col("qid") < _N_QUERIES)), "qid")
        .join(quant.withColumnRenamed("vec_id", "nid"), "nid")
        .select(
            "qid",
            "nid",
            F.aggregate(
                F.zip_with("qe", "qv", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("dot"),
        )
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm2").alias("nrm2_q"))
    ne = norms.select(F.col("vec_id").alias("nid"), F.col("nrm2").alias("nrm2_n"))
    sims = (
        dots.join(F.broadcast(nq), "qid")
        .join(ne, "nid")
        .select(
            "qid",
            "nid",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nrm2_q").cast("double"))
                    * F.sqrt(F.col("nrm2_n").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("qid", "nid", pround(F.col("cosine"), 6).alias("cosine"))
    )
