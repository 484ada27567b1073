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


# --------------------------------------------------------------------------
# Perceptual-hash (aHash) near-duplicate detection over the binary payload
# column — the 8th dedup strategy, and the first for media: text has seven
# near-dup paths, media previously had exact-md5 only.
#
# The "decoded 8x8 grayscale grid" of a real pHash pipeline is stood in by
# a LOCALITY-PRESERVING fake decode: the payload is cut into 64 byte
# slices and each pixel is an md5-derived 0..255 value of its slice.  A
# local edit to the media bytes changes only the slices it touches, so
# near-identical payloads get near-identical pixel grids — exactly the
# property a real perceptual hash extracts, with the codec swapped for
# deterministic arithmetic the DuckDB oracle can replay (the payload is
# the UTF-8 bytes of `text`, pure ASCII in this corpus, so byte slices ==
# char slices; see functions/multimodal.py).
#
# Hash: bit_j = (pixel_j > mean) packed as 4 bands x 16 bits.  Candidate
# generation is Hamming LSH on exact band equality: any pair with
# distance <= 3 shares at least one untouched band (pigeonhole over 4
# bands), so recall at the threshold is exact, never probabilistic.
# Verification: full 64-bit Hamming via bit_count(xor) on the band words.
#
# 100 TB posture: one interpreted-HOF projection per image (a few hundred
# lambda nodes/row — no Python), postings = 4 slim rows/image, degenerate
# buckets dropped by the stop-bucket cap (the winnowing lesson), pair join
# pinned off broadcast, no all-pairs path.  The pixel/band pipeline is
# let-bound via the element_at(transform(array(..)))-trick so
# CollapseProject cannot re-inline the 64-slice md5 work per bit.
# --------------------------------------------------------------------------
_PH_BANDS = 4
_PH_BITS = 16  # bits per band
_PH_HAM_MAX = 3  # <= 3 differing bits => at least one clean band
_PH_BUCKET_CAP = 256  # stop-bucket: drop degenerate (band, value) postings

_PH_BANDS_EXPR = """
element_at(transform(array(
    transform(sequence(0, 63), j ->
      CAST(conv(substr(md5(substring(payload, CAST(j * chunk + 1 AS INT),
                                     CAST(chunk AS INT))), 1, 2),
                16, 10) AS INT))
  ), px ->
  element_at(transform(array(aggregate(px, 0, (acc, x) -> acc + x)), tot ->
    transform(sequence(0, 3), b ->
      aggregate(sequence(0, 15), CAST(0 AS BIGINT),
        (acc, i) -> acc * 2 + IF(element_at(px, CAST(b * 16 + i + 1 AS INT)) * 64 > tot,
                                 CAST(1 AS BIGINT), CAST(0 AS BIGINT))))
  ), 1)
), 1)
"""

_PH_PX_SQL = (
    "(strpos('0123456789abcdef', substr(md5(substring(text, "
    "CAST(j AS INT) * chunk + 1, chunk)), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(md5(substring(text, "
    "CAST(j AS INT) * chunk + 1, chunk)), 2, 1)) - 1)"
)


@register(
    "dedup_image_phash",
    f"""
    WITH img AS (
      SELECT doc_id AS media_id, text,
             GREATEST(1, (length(text) + 63) // 64) AS chunk
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT media_id,
             list_transform(range(64), j -> {_PH_PX_SQL}) AS px
      FROM img
    ),
    bands AS (
      SELECT media_id,
             list_transform(range({_PH_BANDS}), b ->
               CAST(list_sum(list_transform(range({_PH_BITS}), i ->
                 CASE WHEN px[CAST(b * {_PH_BITS} + i + 1 AS INT)] * 64 > tot
                      THEN CAST(1 AS BIGINT) << CAST({_PH_BITS} - 1 - i AS INT)
                      ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS bands
      FROM (SELECT media_id, px, list_sum(px) AS tot FROM px)
    ),
    post AS (
      SELECT media_id, bands, pos - 1 AS band_idx, bands[CAST(pos AS INT)] AS band_val
      FROM bands, LATERAL (SELECT unnest(generate_series(1, {_PH_BANDS})) AS pos) t
    ),
    capped AS (
      SELECT media_id, bands, band_idx, band_val FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bs
        FROM post
      ) WHERE bs <= {_PH_BUCKET_CAP}
    ),
    scored AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             CAST(list_sum(list_transform(range({_PH_BANDS}), k ->
               bit_count(xor(a.bands[CAST(k + 1 AS INT)],
                             b.bands[CAST(k + 1 AS INT)])))) AS BIGINT) AS hamming
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.media_id < b.media_id
    )
    SELECT DISTINCT id_a, id_b, hamming
    FROM scored WHERE hamming <= {_PH_HAM_MAX}
    """,
)
def dedup_image_phash(spark, sf_dir):
    """Near-duplicate image pairs by perceptual hash: 64 locality-
    preserving md5-slice pixels -> 64-bit aHash as 4x16-bit bands ->
    Hamming LSH band join (exact recall at distance <= {_PH_HAM_MAX} by
    pigeonhole) -> bit_count(xor) verification."""
    from pyspark.sql import Window as W

    d = spread(load_table(spark, sf_dir, "documents"))
    m = as_media(d).filter(F.col("media_type") == "image")
    bands = (
        m.withColumn(
            "chunk", F.greatest(F.lit(1), F.expr("(length(payload) + 63) DIV 64"))
        )
        .select("media_id", F.expr(_PH_BANDS_EXPR).alias("bands"))
    )
    post = bands.select("media_id", "bands", F.posexplode("bands")).select(
        "media_id",
        "bands",
        F.col("pos").cast("long").alias("band_idx"),
        F.col("col").alias("band_val"),
    )
    bucket = W.partitionBy("band_idx", "band_val")
    from .registry import cache_scoped

    # slim postings (4 rows/image of id + 4 band words) cached so the
    # 64-slice md5 projection runs once, not once per join side
    capped = cache_scoped(
        post.withColumn("bs", F.count(F.lit(1)).over(bucket))
        .filter(F.col("bs") <= _PH_BUCKET_CAP)
        .drop("bs")
    )
    a = capped.select(
        "band_idx",
        "band_val",
        F.col("media_id").alias("id_a"),
        F.col("bands").alias("bands_a"),
    )
    b = capped.select(
        "band_idx",
        "band_val",
        F.col("media_id").alias("id_b"),
        F.col("bands").alias("bands_b"),
    )
    ham = F.expr(
        "CAST(aggregate(zip_with(bands_a, bands_b, (x, y) -> bit_count(x ^ y)), "
        "0, (acc, v) -> acc + v) AS BIGINT)"
    )
    # both sides scale with the corpus: pin off broadcast (sf10 AQE lesson)
    scored = (
        a.join(b.hint("shuffle_hash"), ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
    )
    return scored.filter(F.col("hamming") <= _PH_HAM_MAX).distinct()
