"""Near-duplicate detection beyond MinHash-LSH (queries/text.py):
SimHash banding, blocked n-gram Jaccard, and embedding-cosine near-dup —
the remaining members of the LLM-data dedup toolkit.

All hash math is MD5-derived so the DuckDB oracle reproduces Spark
bit-for-bit; all pipelines are sub-quadratic by construction:

* SimHash (Charikar '02): 32-bit signature from per-token hash votes; LSH
  banding (4 bands x 8 bits) generates candidates; Hamming-distance verify.
  One explode + one groupBy(doc) + a narrow band self-join.
* n-gram Jaccard: word-trigram sets compared only inside deterministic
  blocking buckets (source, length-band) — the classic blocking-key dedup.
  Bucket sizes are bounded, so the in-bucket pair join never goes O(n²).
* Embedding cosine: sign-bit LSH (axis-aligned hyperplanes over the first
  8 dims) buckets vectors; exact quantized cosine verifies candidates.
  The corpus never self-joins outside a bucket.

At 100 TB: each pipeline's candidate stage shuffles only (key, id) pairs;
verification joins are restricted to candidate ids.  Skewed buckets (a
degenerate band key collecting millions of docs) are the known failure mode
— production runs should salt or cap bucket sizes; see
``operators/similarity.py`` for the capped variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import pround
from ..sources.tables import load_table, spread
from .registry import cache_scoped, register

# --------------------------------------------------------------------------
# SimHash: 32 bits, majority vote over distinct tokens; hash_b(t) = top bit
# of md5(b|t).  Bit-string representation avoids cross-engine int64 quirks.
# --------------------------------------------------------------------------
# Canonical web-dedup setting (Manku et al. '07): 64-bit signature, Hamming
# radius 3, banded into 4 x 16-bit sub-keys for candidate generation.
_SIM_BITS = 64
_SIM_BANDS = 4
_BITS_PER_BAND = _SIM_BITS // _SIM_BANDS
_HAMMING_MAX = 3

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKENS_SQL = f"""
  toks AS (
    SELECT DISTINCT doc_id, tok
    FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
          FROM documents WHERE trim(text) <> '')
    WHERE tok <> ''
  )
"""
# One md5 per token supplies all 64 bits: hex digit j of md5(tok) carries
# bits 4j..4j+3 (bit b = (digit[b/4] >> (3 - b%4)) & 1) — 64× less hashing
# than a per-bit hash family, same uniformity.
_DIGIT_SQL = ",\n           ".join(
    f"(strpos('0123456789abcdef', substr(md5(tok), {j + 1}, 1)) - 1) AS d{j}"
    for j in range(_SIM_BITS // 4)
)
_VOTE_SQL = ",\n           ".join(
    "CAST(SUM(CAST(floor(d{j} / {p}) AS INT) % 2) AS BIGINT) AS v{b}".format(
        j=b // 4, p=2 ** (3 - b % 4), b=b
    )
    for b in range(_SIM_BITS)
)
# Signature = 4×16-bit integers (one per band): integer band keys make the
# LSH self-join a cheap int equi-join, and Hamming distance collapses to
# bit_count(xor) — no per-character string work anywhere.
_BAND_INT_SQL = [
    "("
    + " + ".join(
        f"(CASE WHEN 2 * v{k * _BITS_PER_BAND + j} > n "
        f"THEN {1 << (_BITS_PER_BAND - 1 - j)} ELSE 0 END)"
        for j in range(_BITS_PER_BAND)
    )
    + f") AS i{k}"
    for k in range(_SIM_BANDS)
]
_SIM_BAND_UNION_SQL = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band, i{b} AS bkey FROM sigs"
    for b in range(_SIM_BANDS)
)
_HAMMING_SQL = " + ".join(
    f"bit_count(xor(CAST(s1.i{k} AS BIGINT), CAST(s2.i{k} AS BIGINT)))"
    for k in range(_SIM_BANDS)
)

_SIMHASH_SQL = f"""
    WITH {_TOKENS_SQL},
    digits AS (
      SELECT doc_id,
           {_DIGIT_SQL}
      FROM toks
    ),
    votes AS (
      SELECT doc_id,
           {_VOTE_SQL},
           COUNT(*) AS n
      FROM digits GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {", ".join(_BAND_INT_SQL)} FROM votes),
    bands AS (
{_SIM_BAND_UNION_SQL}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                              AND a.doc_id < b.doc_id
    )
    SELECT c.id1, c.id2,
           CAST({_HAMMING_SQL} AS BIGINT) AS hamming
    FROM cand c
    JOIN sigs s1 ON c.id1 = s1.doc_id
    JOIN sigs s2 ON c.id2 = s2.doc_id
    WHERE {_HAMMING_SQL} <= {_HAMMING_MAX}
"""


# Cluster labeling over the simhash pair graph: the pipeline-level dedup
# deliverable ("keep one canonical doc per cluster").  Pair enumeration is
# O(k²) per duplicate cluster (one ~580-doc cluster at sf0.1 = ~166k pairs);
# components are O(k) — the only shape that survives 100 TB.  Oracle =
# recursive-CTE reachability over the same pair SQL.
_SIMHASH_CC_SQL = f"""
    WITH RECURSIVE pairs AS ({{simhash}}),
    edges AS (SELECT id1 AS a, id2 AS b FROM pairs
              UNION ALL SELECT id2, id1 FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ),
    labels AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*) AS n_members
    FROM labels GROUP BY component
""".format(simhash=_SIMHASH_SQL)


@register("dedup_simhash_components", _SIMHASH_CC_SQL)
def dedup_simhash_components(spark, sf_dir):
    """Near-dup CLUSTERS from the simhash pair graph via distributed
    min-label propagation (``operators/graph.py``) — the scalable
    alternative to pair enumeration for large duplicate clusters."""
    from ..operators.graph import connected_components

    pairs = dedup_simhash(spark, sf_dir)
    labels = connected_components(pairs, src="id1", dst="id2")
    return labels.groupBy(F.col("comp").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@register("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: banding for candidates, Hamming verify.

    Plan: explode tokens → one partial/final hash-agg computing 32 vote
    counters per doc → tiny sigs relation → band self-join → verify.  The
    doc text itself never crosses a shuffle after the first agg.
    """
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.trim("text") != "")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # Per-doc token dedup happens map-side (array_distinct before explode) —
    # the naive explode-then-DISTINCT plan shuffles every (doc_id, token)
    # pair; this plan's only shuffle is the 65-counter partial/final agg.
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(norm, " "))).alias("tok")
    ).filter(F.col("tok") != "")
    # Two 32-bit ints carry all 64 md5 bits (hex digit j = nibble j, most
    # significant first), so bit b of the oracle's digit arithmetic is
    # (h1 >> (31-b)) & 1 for b<32 and (h2 >> (63-b)) & 1 above — identical
    # bits at 1/8th the string work of per-digit conv() extraction.
    # hoist the md5 into its own column so the digest is computed once per
    # token even if codegen's subexpression elimination doesn't fire
    halves = toks.withColumn("__md5__", F.md5("tok")).select(
        "doc_id",
        F.conv(F.substring("__md5__", 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("__md5__", 9, 8), 16, 10).cast("long").alias("h2"),
    )
    votes = halves.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h1" if b < 32 else "h2"), (31 - b) % 32).bitwiseAND(
                    F.lit(1)
                )
            ).alias(f"v{b}")
            for b in range(_SIM_BITS)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    band_int = [
        sum(
            F.when(
                2 * F.col(f"v{k * _BITS_PER_BAND + j}") > F.col("n"),
                1 << (_BITS_PER_BAND - 1 - j),
            ).otherwise(0)
            for j in range(_BITS_PER_BAND)
        ).alias(f"i{k}")
        for k in range(_SIM_BANDS)
    ]
    sigs = cache_scoped(votes.select("doc_id", *band_int))
    # Carry the full 4-int signature through the band self-join so Hamming
    # verification runs inline in the join's codegen stage; only the tiny
    # post-filter survivor set is deduplicated (a pair can collide in
    # several bands).  This avoids shuffling the raw candidate-pair set and
    # the two signature-reattach joins of the naive banding plan.
    bands = None
    for b in range(_SIM_BANDS):
        part = sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.col(f"i{b}").alias("bkey"),
            *[F.col(f"i{k}") for k in range(_SIM_BANDS)],
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(
        F.col("doc_id").alias("id1"), "band", "bkey",
        *[F.col(f"i{k}").alias(f"a{k}") for k in range(_SIM_BANDS)],
    )
    bb = bands.select(
        F.col("doc_id").alias("id2"), "band", "bkey",
        *[F.col(f"i{k}").alias(f"b{k}") for k in range(_SIM_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").cast("long").bitwiseXOR(F.col(f"b{k}").cast("long")))
        for k in range(_SIM_BANDS)
    ).cast("bigint")
    return (
        a.join(bb, ["band", "bkey"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .select("id1", "id2", "hamming")
        .distinct()
    )


# --------------------------------------------------------------------------
# Blocked n-gram Jaccard: word bigrams, blocking on length bands (near-dups
# have near-identical lengths; the corpus's injected dups are cross-source,
# so source is NOT part of the key).  Each doc probes its own band ±1 via
# staggered keys, so band-boundary pairs aren't lost; candidate generation
# stays an equi-join (hash-joinable at scale, never O(n²)).
#
# Design note: AllPairs-style prefix filtering was measured as the
# alternative candidate generator — at this low threshold (t=0.2 → prefix
# keeps 80% of each doc's grams) its posting-list join produced MORE work
# than length blocking (37s vs 4.5s at sf0.1).  Prefix filtering wins at
# the t≥0.7 thresholds production near-dup dedup typically uses; blocking
# wins for low-threshold similarity mining.  Both stay sub-quadratic.
# --------------------------------------------------------------------------
_JAC_MIN = 0.2
_LEN_BAND = 32

# 60-bit integer gram hash: first 15 hex chars of md5, parsed positionally —
# integer-array intersections are ~3× cheaper than string-array ones, and
# the hash is reproducible in both engines (collision probability at 2^60 is
# negligible, and identical on both sides anyway).
_HEX15_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr({{h}}, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
) + ")"

_NGRAM_JACCARD_SQL = f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_SQL} AS t
      FROM documents WHERE trim(text) <> ''
    ),
    toks AS (SELECT doc_id, t, string_split(t, ' ') AS w FROM norm),
    gsets AS (
      SELECT doc_id,
             CAST(floor(len(t) / {_LEN_BAND}.0) AS BIGINT) AS lenband,
             list_distinct(list_transform(
               CASE WHEN len(w) < 2 THEN [t]
                    ELSE list_transform(range(1, len(w)),
                         i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1])
               END,
               s -> {_HEX15_SQL.format(h='md5(s)')})) AS g
      FROM toks
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM (SELECT doc_id, unnest([lenband - 1, lenband, lenband + 1]) AS k
            FROM gsets) a
      JOIN gsets b ON a.k = b.lenband AND a.doc_id < b.doc_id
    )
    SELECT c.id1, c.id2,
           (CAST(floor(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
                 / CAST(len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)) AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS jaccard
    FROM cand c
    JOIN gsets ga ON c.id1 = ga.doc_id
    JOIN gsets gb ON c.id2 = gb.doc_id
    WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
          / CAST(len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)) AS DOUBLE)
          >= {_JAC_MIN}
"""


@register("dedup_ngram_jaccard", _NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Word-bigram Jaccard inside length-band blocking buckets (±1 band)."""
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.trim("text") != "")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    base = d.select("doc_id", norm.alias("t")).withColumn("w", F.split("t", " "))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(" ", F.element_at("w", i + 1), F.element_at("w", i + 2)),
    )
    ghash = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    gsets = base.select(
        "doc_id",
        F.floor(F.length("t") / _LEN_BAND).alias("lenband"),
        F.array_distinct(
            F.transform(
                F.when(F.size("w") < 2, F.array(F.col("t"))).otherwise(bigrams),
                ghash,
            )
        ).alias("g"),
    )
    gsets = cache_scoped(gsets)
    # Two-level blocking: ±1 length band AND a shared PREFIX gram.  The
    # sf1 rehearsal (scripts/scale_rehearsal.py) showed length bands alone
    # go quadratic in per-band density (70× slowdown at 10× data): the
    # block key ignores content, so every in-band pair is a candidate.
    # Prefix filtering (AllPairs/PPJoin lemma): sort each gram set in one
    # global order (the hash value); if J(A,B) >= t then A and B share a
    # gram within their first |S| - ceil(t*|S|) + 1 grams — so joining on
    # (band, prefix-gram) generates a SUPERSET of the true pairs and the
    # oracle-checked output is unchanged.  Candidates are slim (id, id)
    # pairs — the gram arrays do NOT ride the fan-out join; after distinct
    # (a pair can share several prefix grams) the arrays reattach via two
    # joins against the cached gsets and verification runs in codegen.
    # A corpus where everything truly matches is output-quadratic no
    # matter the blocking; this keeps candidate volume proportional to
    # docs-sharing-content, not (docs-per-band)².
    pref = F.expr(
        f"slice(array_sort(g), 1, greatest(1, size(g) - CAST(ceil(size(g) * {_JAC_MIN}) AS INT) + 1))"
    )
    gp = gsets.select("doc_id", "lenband", pref.alias("pgs"))
    probes = gp.select(
        F.col("doc_id").alias("id1"),
        "pgs",
        F.explode(
            F.array(F.col("lenband") - 1, F.col("lenband"), F.col("lenband") + 1)
        ).alias("k"),
    ).select("id1", F.explode("pgs").alias("pg"), "k")
    index = gp.select(
        F.col("doc_id").alias("id2"), F.explode("pgs").alias("pg"), F.col("lenband").alias("k")
    )
    # merge hint: a hot prefix gram's posting list makes the per-key fanout
    # large; sort-merge streams it (and spills) where a hash build of a
    # skewed partition OOMed a task at the sf10 rehearsal.  The gset
    # reattach joins get the same pin — gram arrays must never broadcast
    # (corpus-scaling, and AQE's columnar size estimate is ~20× low).
    cand = (
        probes.join(index.hint("merge"), ["k", "pg"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    pairs = cand.join(
        gsets.select(F.col("doc_id").alias("id1"), F.col("g").alias("g1")).hint("shuffle_hash"),
        "id1",
    ).join(
        gsets.select(F.col("doc_id").alias("id2"), F.col("g").alias("g2")).hint("shuffle_hash"),
        "id2",
    )
    inter = F.size(F.array_intersect("g1", "g2"))
    union = F.size("g1") + F.size("g2") - inter
    jac = inter.cast("double") / union.cast("double")
    return pairs.filter(jac >= _JAC_MIN).select(
        "id1", "id2", pround(jac, 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup: banded sign-bit LSH (8 bands × 8 bits = all 64
# dims) → deterministic per-bucket cap → in-bucket exact quantized cosine.
# Quantization contract shared with queries/similarity.py.
#
# Skew posture: a band key is 8 sign bits, so a pathological bucket could
# collect n/256 vectors; the cap bounds every bucket to _BUCKET_CAP members
# (rank = md5(vec_id) — deterministic pseudo-random, so the kept subset is
# unbiased and identical in both engines).  Per-band join work is therefore
# ≤ buckets × cap², never (n/256)², regardless of data skew.  At larger
# corpora raise _BITS_PER_BAND (finer buckets) and the band count together —
# band count tunes recall, bits/band tunes bucket size; the union of 8 bands
# has ~7× the recall of the old single-band key at the 0.3-0.45 cosine range
# this threshold targets.
# --------------------------------------------------------------------------
_COS_MIN = 0.3
_EMB_BANDS = 8
_EMB_BITS = 8  # bits per band; bands × bits = embedding dims
_BUCKET_CAP = 256
_DIM = 64
_Q = 1_000_000

_QE = "CAST(round(CAST({v}.embedding[CAST(u AS INT) + 1] AS DOUBLE) * 1000000, 0) AS BIGINT)"
_EMB_KEY_SQL = [
    "("
    + " + ".join(
        f"(CASE WHEN embedding[{b * _EMB_BITS + j + 1}] >= 0 "
        f"THEN {1 << (_EMB_BITS - 1 - j)} ELSE 0 END)"
        for j in range(_EMB_BITS)
    )
    + f") AS k{b}"
    for b in range(_EMB_BANDS)
]
_EMB_BAND_UNION_SQL = "\n      UNION ALL\n".join(
    f"      SELECT vec_id, {b} AS band, k{b} AS bkey FROM v"
    for b in range(_EMB_BANDS)
)

_EMB_NEARDUP_SQL = f"""
    WITH v AS (SELECT vec_id, embedding, {", ".join(_EMB_KEY_SQL)} FROM embeddings),
    bands AS (
{_EMB_BAND_UNION_SQL}
    ),
    capped AS (
      SELECT vec_id, band, bkey FROM (
        SELECT vec_id, band, bkey,
               row_number() OVER (PARTITION BY band, bkey
                                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM bands) WHERE rn <= {_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM capped a JOIN capped b ON a.band = b.band AND a.bkey = b.bkey
                                 AND a.vec_id < b.vec_id
    ),
    qdots AS (
      SELECT c.id1, c.id2,
             SUM({_QE.format(v='a')} * {_QE.format(v='b')}) AS dot,
             SUM({_QE.format(v='a')} * {_QE.format(v='a')}) AS n1,
             SUM({_QE.format(v='b')} * {_QE.format(v='b')}) AS n2
      FROM cand c
      JOIN embeddings a ON c.id1 = a.vec_id
      JOIN embeddings b ON c.id2 = b.vec_id
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2
    )
    SELECT id1, id2,
           (CAST(floor(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS cosine
    FROM qdots
    WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
          >= {_COS_MIN}
"""


def _emb_banded_capped(e, cap: int = _BUCKET_CAP):
    """(vec_id, qv, band, bkey) with every (band, bkey) bucket capped to
    ``cap`` members by deterministic md5 rank — the skew-bounding stage."""
    from pyspark.sql import Window as W

    qv = F.transform("embedding", lambda x: F.round(x.cast("double") * _Q, 0).cast("long"))
    keys = [
        sum(
            F.when(
                F.element_at("embedding", b * _EMB_BITS + j + 1) >= 0,
                1 << (_EMB_BITS - 1 - j),
            ).otherwise(0)
            for j in range(_EMB_BITS)
        ).alias(f"k{b}")
        for b in range(_EMB_BANDS)
    ]
    v = e.select("vec_id", qv.alias("qv"), *keys)
    bands = v.select(
        "vec_id",
        "qv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"k{b}").alias("bkey")
                    )
                    for b in range(_EMB_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "qv", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    w = W.partitionBy("band", "bkey").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        bands.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= cap)
        .drop("__rn__")
    )


@register("dedup_embedding_cosine", _EMB_NEARDUP_SQL)
def dedup_embedding_cosine(spark, sf_dir):
    """Banded sign-LSH embedding near-dup with capped buckets and exact
    cosine verify.

    Candidates come from per-band sign-key equality; every bucket is capped
    (see ``_emb_banded_capped``), so join work is bounded under any skew.
    The full quantized vector rides through the band join — verification is
    inline in the join's codegen stage (same shape as ``dedup_simhash``) —
    and the union-of-bands duplicates collapse in one final distinct.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    capped = cache_scoped(_emb_banded_capped(e))
    a = capped.select(
        F.col("vec_id").alias("id1"), F.col("qv").alias("q1"), "band", "bkey"
    )
    b = capped.select(
        F.col("vec_id").alias("id2"), F.col("qv").alias("q2"), "band", "bkey"
    )
    # shuffle_hash pin: both sides carry the quantized vector array and
    # scale with the corpus — never eligible for broadcast (AQE's columnar
    # size estimate undercounts array rows badly; see the minhash sf10 OOM)
    pairs = a.join(b.hint("shuffle_hash"), ["band", "bkey"]).filter(F.col("id1") < F.col("id2"))
    dot = F.aggregate(
        F.zip_with("q1", "q2", lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n1 = F.aggregate(F.transform("q1", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)
    n2 = F.aggregate(F.transform("q2", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)
    cos = dot.cast("double") / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))
    return (
        pairs.withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= _COS_MIN)
        .select("id1", "id2", pround(F.col("cosine_raw"), 6).alias("cosine"))
        .distinct()
    )


# --------------------------------------------------------------------------
# Semantic decontamination: eval-set leakage detection by EMBEDDING
# similarity (the semantic cousin of the n-gram decontaminate_train_eval
# — catches paraphrased leakage n-grams miss).  Reuses the banded
# sign-LSH + capped buckets + exact quantized cosine machinery above;
# the oracle runs the identical banding, so both engines agree on the
# exact candidate set and scores.
#
# Scale posture: identical to dedup_embedding_cosine (bounded bucket
# join), except one join side is the eval slice — tiny in practice, but
# NOT broadcast: it rides the same banded shuffle, so the plan is
# skew-safe even when the "eval set" is itself corpus-sized.
# --------------------------------------------------------------------------
_DECON_COS = 0.3
_EVAL_MOD = 97

_SEMANTIC_DECON_SQL = f"""
    WITH v AS (SELECT vec_id, embedding, {", ".join(_EMB_KEY_SQL)} FROM embeddings),
    bands AS (
{_EMB_BAND_UNION_SQL}
    ),
    capped AS (
      SELECT vec_id, band, bkey FROM (
        SELECT vec_id, band, bkey,
               row_number() OVER (PARTITION BY band, bkey
                                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM bands) WHERE rn <= {_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM capped a JOIN capped b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.vec_id % {_EVAL_MOD} <> 0 AND b.vec_id % {_EVAL_MOD} = 0
    ),
    scored AS (
      SELECT c.id1, c.id2,
             CAST(SUM({_QE.format(v='a')} * {_QE.format(v='b')}) AS DOUBLE)
               / (sqrt(CAST(SUM({_QE.format(v='a')} * {_QE.format(v='a')}) AS DOUBLE))
                  * sqrt(CAST(SUM({_QE.format(v='b')} * {_QE.format(v='b')}) AS DOUBLE))) AS cos
      FROM cand c
      JOIN embeddings a ON c.id1 = a.vec_id
      JOIN embeddings b ON c.id2 = b.vec_id
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2
    ),
    hits AS (SELECT * FROM scored WHERE cos >= {_DECON_COS})
    SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id % {_EVAL_MOD} = 0) AS n_eval,
           (SELECT COUNT(*) FROM embeddings WHERE vec_id % {_EVAL_MOD} <> 0) AS n_train,
           (SELECT COUNT(*) FROM hits) AS n_leak_pairs,
           (SELECT COUNT(DISTINCT id1) FROM hits) AS n_flagged_train,
           (SELECT (CAST(floor(MAX(cos) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
            FROM hits) AS max_cosine
"""


@register("semantic_decontaminate_embeddings", _SEMANTIC_DECON_SQL)
def semantic_decontaminate_embeddings(spark, sf_dir):
    """Train vectors semantically too close to the eval slice
    (vec_id % 97 == 0): banded sign-LSH candidates, exact quantized
    cosine ≥ 0.3, per-corpus leak summary."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    capped = cache_scoped(_emb_banded_capped(e))
    is_eval = F.col("vec_id") % _EVAL_MOD == 0
    a = capped.filter(~is_eval).select(
        F.col("vec_id").alias("id1"), F.col("qv").alias("q1"), "band", "bkey"
    )
    b = capped.filter(is_eval).select(
        F.col("vec_id").alias("id2"), F.col("qv").alias("q2"), "band", "bkey"
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), ["band", "bkey"])
        .dropDuplicates(["id1", "id2"])
    )
    dot = F.aggregate(
        F.zip_with("q1", "q2", lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n1 = F.aggregate(F.transform("q1", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)
    n2 = F.aggregate(F.transform("q2", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)
    cos = dot.cast("double") / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))
    hits = pairs.withColumn("cos", cos).filter(F.col("cos") >= _DECON_COS)
    summary = hits.agg(
        F.count(F.lit(1)).alias("n_leak_pairs"),
        F.countDistinct("id1").alias("n_flagged_train"),
        pround(F.max("cos"), 6).alias("max_cosine"),
    )
    counts = e.agg(
        F.sum(F.when(is_eval, 1).otherwise(0)).cast("long").alias("n_eval"),
        F.sum(F.when(~is_eval, 1).otherwise(0)).cast("long").alias("n_train"),
    )
    return counts.crossJoin(F.broadcast(summary)).select(
        "n_eval", "n_train", "n_leak_pairs", "n_flagged_train", "max_cosine"
    )


# --------------------------------------------------------------------------
# Hard-negative mining for contrastive embedding training: for each anchor
# vector, the k nearest candidates that are CLOSE BUT NOT DUPLICATES
# (cosine inside a band below the dup threshold) — the pairs a
# contrastive loss learns the most from.  Same banded-LSH candidate
# machinery; ranking window per anchor.
# --------------------------------------------------------------------------
_HN_LO = 0.10
_HN_HI = _COS_MIN  # dup threshold = the ceiling for "negative"
_HN_K = 2
_ANCHOR_MOD = 50

_HARD_NEG_SQL = f"""
    WITH v AS (SELECT vec_id, embedding, {", ".join(_EMB_KEY_SQL)} FROM embeddings),
    bands AS (
{_EMB_BAND_UNION_SQL}
    ),
    capped AS (
      SELECT vec_id, band, bkey FROM (
        SELECT vec_id, band, bkey,
               row_number() OVER (PARTITION BY band, bkey
                                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM bands) WHERE rn <= {_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS negative_id
      FROM capped a JOIN capped b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.vec_id % {_ANCHOR_MOD} = 0 AND b.vec_id % {_ANCHOR_MOD} <> 0
    ),
    scored AS (
      SELECT c.anchor_id, c.negative_id,
             CAST(SUM({_QE.format(v='a')} * {_QE.format(v='b')}) AS DOUBLE)
               / (sqrt(CAST(SUM({_QE.format(v='a')} * {_QE.format(v='a')}) AS DOUBLE))
                  * sqrt(CAST(SUM({_QE.format(v='b')} * {_QE.format(v='b')}) AS DOUBLE))) AS cos
      FROM cand c
      JOIN embeddings a ON c.anchor_id = a.vec_id
      JOIN embeddings b ON c.negative_id = b.vec_id
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2
    )
    SELECT anchor_id, rank, negative_id,
           (CAST(floor(cos * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS cosine
    FROM (
      SELECT anchor_id, negative_id, cos,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cos DESC, negative_id) AS rank
      FROM scored WHERE cos >= {_HN_LO} AND cos < {_HN_HI}
    ) WHERE rank <= {_HN_K}
    """


@register("hard_negative_mining", _HARD_NEG_SQL)
def hard_negative_mining(spark, sf_dir):
    """Top-2 hard negatives per anchor (vec_id % 50 == 0): banded LSH
    candidates with exact quantized cosine in [0.10, 0.30) — similar
    enough to be informative, below the near-dup threshold."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    capped = cache_scoped(_emb_banded_capped(e))
    is_anchor = F.col("vec_id") % _ANCHOR_MOD == 0
    a = capped.filter(is_anchor).select(
        F.col("vec_id").alias("anchor_id"), F.col("qv").alias("q1"), "band", "bkey"
    )
    b = capped.filter(~is_anchor).select(
        F.col("vec_id").alias("negative_id"), F.col("qv").alias("q2"), "band", "bkey"
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), ["band", "bkey"])
        .dropDuplicates(["anchor_id", "negative_id"])
    )
    dot = F.aggregate(
        F.zip_with("q1", "q2", lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n1 = F.aggregate(F.transform("q1", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)
    n2 = F.aggregate(F.transform("q2", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)
    cos = dot.cast("double") / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))
    from pyspark.sql import Window as W

    scored = pairs.withColumn("cos", cos).filter(
        (F.col("cos") >= _HN_LO) & (F.col("cos") < _HN_HI)
    )
    win = W.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _HN_K)
        .select(
            "anchor_id",
            "rank",
            "negative_id",
            pround(F.col("cos"), 6).alias("cosine"),
        )
    )
