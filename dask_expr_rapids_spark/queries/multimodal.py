"""Multimodal-column queries: binary payload plumbing over the documents
table (functions/multimodal.py).  The decode stage's md5 arithmetic is the
shared contract that lets DuckDB oracle-check a Python-UDF pipeline:
Spark hashes payload *bytes* in Python, the oracle hashes the source text
(identical bytes — payload IS the UTF-8 encoding of text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.multimodal import as_media, fake_decode_stats, frame_sample
from ..sources.tables import load_table, spread
from .registry import register

_MT_SQL = "['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]"


def _hexpair_sql(h: str, pos: int) -> str:
    """DuckDB int value of two hex chars of ``h`` at 1-based ``pos``."""
    c1 = f"(strpos('0123456789abcdef', substr({h}, {pos}, 1)) - 1)"
    c2 = f"(strpos('0123456789abcdef', substr({h}, {pos + 1}, 1)) - 1)"
    return f"({c1} * 16 + {c2})"


def _hexquad_sql(h: str, pos: int) -> str:
    return f"({_hexpair_sql(h, pos)} * 256 + {_hexpair_sql(h, pos + 2)})"


# --------------------------------------------------------------------------
# Metadata-only stats: never touches payload bytes (column pruning keeps the
# scan narrow — the point of separating payload from metadata).
# --------------------------------------------------------------------------
@register(
    "multimodal_payload_stats",
    f"""
    SELECT {_MT_SQL} AS media_type,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_payload_stats(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    m = as_media(d)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.countDistinct(F.md5("payload")).alias("n_distinct_payloads"),
    )


# --------------------------------------------------------------------------
# Decode stage: Arrow-batched binary → typed features via mapInPandas.
# Oracle reproduces the md5-derived fake decoder in pure SQL arithmetic.
# --------------------------------------------------------------------------
@register(
    "multimodal_decode_features",
    f"""
    WITH m AS (SELECT doc_id AS media_id, {_MT_SQL} AS media_type,
                      md5(text) AS h, octet_length(encode(text)) AS nb
               FROM documents)
    SELECT media_id, media_type,
           CAST(64 + {_hexpair_sql('h', 1)} % 192 AS INT) AS width,
           CAST(64 + {_hexpair_sql('h', 3)} % 192 AS INT) AS height,
           CAST({_hexquad_sql('h', 5)} % 256 AS INT) AS intensity,
           CAST(nb AS BIGINT) AS n_bytes
    FROM m
    """,
)
def multimodal_decode_features(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    return fake_decode_stats(as_media(d))


# --------------------------------------------------------------------------
# Frame sampling: payload → array<binary> slices; verify via per-media
# frame count and total sliced bytes (byte arithmetic is engine-portable,
# the raw slices themselves are not SQL-comparable).
# --------------------------------------------------------------------------
@register(
    "multimodal_frame_stats",
    """
    SELECT doc_id AS media_id,
           CAST(4 AS INT) AS n_frames,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def multimodal_frame_stats(spark, sf_dir):
    """Video-ish media only (media_type = 'video'): sample 4 frames per
    payload, report per-media frame count + original byte size."""
    d = spread(load_table(spark, sf_dir, "documents"))
    m = as_media(d).filter(F.col("media_type") == "video")
    frames = m.withColumn("frames", frame_sample(m, 4))
    return frames.select(
        "media_id",
        F.size("frames").alias("n_frames"),
        F.length("payload").alias("payload_bytes"),
    )
