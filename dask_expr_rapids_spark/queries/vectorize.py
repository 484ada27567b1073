"""Feature-hashing TF-IDF vectorization — the training-pipeline stage
that turns raw text into fixed-width numeric features WITHOUT a learned
vocabulary (Weinberger et al. 2009, the "hashing trick").

Why this is the 100 TB vectorizer: a learned vocabulary is corpus-sized
state that must be built, broadcast, and versioned; the hashing trick
replaces it with a stateless md5 modulo into a FIXED feature space
(D=1024 here), which bounds every downstream relation:

* document frequencies: at most D rows (broadcastable by construction);
* per-(source, feature) totals: at most n_sources x D rows — the final
  ranking window runs on thousands of rows regardless of corpus size;
* the only corpus-scaling shuffle is the (doc, feature) tf aggregate,
  map-side combinable.

Determinism discipline (functions/exact.py): tf sums stay integer; each
feature's idf = ln(N/df) is computed ONCE, quantized onto the 1e-9 grid
(qln), and multiplied by the integer tf total — so no float summation
order exists anywhere and the weights hash-match the DuckDB oracle.

Not in the reference (no text-vectorization surface in
``/root/reference/dask_expr/_collection.py``); SURVEY.md §7 phase 4.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import register
from .text import _md5_uint_sql

_D = 1024  # hashed feature-space width
_TOPK = 10
_Q = 1_000_000_000

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


def _qln_sql(expr: str) -> str:
    return f"(CAST(floor(ln({expr}) * {_Q}.0 + 0.5) AS DOUBLE) / {_Q}.0)"


@register(
    "tfidf_hashed_features",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    feat AS (
      SELECT doc_id, source, {_md5_uint_sql('w', 15)} % {_D} AS f
      FROM tok WHERE w <> ''
    ),
    df AS (
      SELECT f, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM feat GROUP BY f
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    sf_tf AS (
      SELECT source, f, CAST(COUNT(*) AS BIGINT) AS total_tf
      FROM feat GROUP BY source, f
    ),
    weighted AS (
      SELECT t.source, t.f, t.total_tf,
             t.total_tf * {_qln_sql("CAST(n.n AS DOUBLE) / CAST(d.df AS DOUBLE)")}
               AS wgt
      FROM sf_tf t JOIN df d ON t.f = d.f CROSS JOIN n
    ),
    ranked AS (
      SELECT source, f, total_tf, wgt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY wgt DESC, f ASC) AS rk
      FROM weighted
    )
    SELECT source, CAST(f AS BIGINT) AS feature_idx, total_tf,
           {pround_expr('wgt', 6)} AS tfidf, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_TOPK}
    """,
)
def tfidf_hashed_features(spark, sf_dir):
    """Top-{_TOPK} hashed TF-IDF features per source: stateless md5
    feature hashing into a fixed {_D}-wide space, integer tf totals,
    one quantized idf multiply per feature."""
    d = spread(load_table(spark, sf_dir, "documents"))
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    tok = d.filter(F.trim("text") != "").select(
        "doc_id", "source", F.explode(F.split(norm, " ")).alias("w")
    )
    feat = tok.filter(F.col("w") != "").select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long") % _D
        ).alias("f"),
    )
    from .registry import cache_scoped

    feat = cache_scoped(feat)
    # document frequency: bounded by the feature-space width (<= D rows)
    df = feat.groupBy("f").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    # the only corpus-scaling shuffle: (source, feature) integer totals
    sf_tf = feat.groupBy("source", "f").agg(
        F.count(F.lit(1)).cast("long").alias("total_tf")
    )
    qln = (
        F.floor(
            F.log(F.col("n").cast("double") / F.col("df").cast("double")) * _Q
            + F.lit(0.5)
        ).cast("double")
        / _Q
    )
    weighted = (
        sf_tf.join(F.broadcast(df), "f")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "source",
            "f",
            "total_tf",
            (F.col("total_tf") * qln).alias("wgt"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("wgt"), F.asc("f"))
    )
    return (
        weighted.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= _TOPK)
        .select(
            "source",
            F.col("f").cast("long").alias("feature_idx"),
            "total_tf",
            pround(F.col("wgt"), 6).alias("tfidf"),
            "rk",
        )
    )
