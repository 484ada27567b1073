"""Distributed graph operators for dedup pipelines: connected components
over a near-duplicate pair list.

Why this exists: every pairwise near-dup detector (MinHash, SimHash,
n-gram Jaccard, embedding LSH — queries/text.py, queries/dedup_ext.py)
emits edges, but the pipeline-level deliverable is "keep one canonical
document per duplicate CLUSTER".  Enumerating pairs inside a k-document
duplicate cluster is O(k²) output — measured concretely at sf0.1, one
~580-doc cluster yields ~166k pairs — while the cluster labeling is O(k).
At 100 TB pair enumeration is impossible for large clusters; components
are the scalable output shape.

Algorithm: iterative min-label propagation (each node adopts the minimum
component id among itself and its neighbors) until fixpoint.  Per
iteration: one join + one groupBy = two shuffles over the edge list;
iteration count = graph diameter, which for near-dup graphs is tiny
(duplicate clusters are dense, star-like).  For adversarial
long-diameter graphs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) converges
in O(log² n) rounds — not needed for dedup-shaped graphs, noted for
parity of design.

Not in the reference (its surface stops at the pandas algebra); this is
the LLM-data extension layer (SURVEY.md §7 phase 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Loop-state sizing: one partition per ~2.5M symmetrized edges (2 longs +
# shuffle overhead ≈ 25 B/row → ~64 MB per partition), floor 8.  Same
# pattern as the streaming sessionize state fix (BENCH_PROTOCOL defect #7):
# derive parallelism from the measured input, never a constant — a fixed
# cap of 8 was fine at rehearsal scale but would funnel a 100 TB corpus's
# billions of edges through 8 tasks per round.
_EDGES_PER_PARTITION = 2_500_000


def _loop_partitions(n_edges: int, floor: int = 8) -> int:
    """Partition count for the CC iteration state, scaling with the edge
    list: ceil(n_edges / ~2.5M), floored so tiny graphs still spread over
    enough tasks to overlap scheduling with work."""
    return max(floor, -(-int(n_edges) // _EDGES_PER_PARTITION))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """(node, component) for every node in the edge list; ``component`` =
    the minimum node id reachable from the node (deterministic canonical
    label).

    Scale posture: labels and edges shuffle on node id each round;
    checkpointing truncates the growing lineage so round N's plan does
    not replay rounds 1..N-1.  The convergence check is a count of
    changed labels — one action per round, O(diameter) rounds.

    EAGER by design: calling this function executes the full upstream
    edge-producing pipeline immediately (the edge list is checkpointed
    and counted to size the loop's parallelism) — an iterative fixpoint
    has no useful lazy form, so plan-only inspection of a CC query is not
    cheap.  Fault tolerance: the default ``localCheckpoint`` stores
    blocks unreplicated on executors, so losing an executor mid-iteration
    fails the job instead of recomputing lineage (acceptable for bounded
    dedup runs — O(diameter) rounds — where a retry is cheaper than
    replicated writes).  For long multi-hour CC runs on a real cluster
    pass ``reliable=True`` to use ``DataFrame.checkpoint`` into the
    fault-tolerant ``spark.sparkContext.setCheckpointDir`` location
    (caller must have set one).
    """
    half = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable else df.localCheckpoint()
    # materialize the (possibly expensive) edge producer ONCE — every
    # iteration joins against it, and without this the upstream pipeline
    # (e.g. a full LSH dedup query) would replay per round.  Checkpointing
    # the half-edge list first also makes the sizing count free: the loop
    # partition count is derived from the MEASURED edge volume, not a
    # constant and not the session-global spark.sql.shuffle.partitions
    # (which is a string like "auto" under some deployments, and mutating
    # it would re-plan concurrent queries on a shared session).
    half = _ckpt(half)
    loop_parts = _loop_partitions(2 * half.count())
    sym = (
        half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(loop_parts, "b")
        .transform(_ckpt)
    )
    # round 0 fused into initialization: start every node at
    # min(self, direct neighbors) instead of self — same shuffle count as
    # the old identity init (one groupBy vs one distinct), but star-shaped
    # duplicate clusters (the common case) now begin one round from
    # convergence instead of two
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__nb__"))
        .select("node", F.least(F.col("node"), F.col("__nb__")).alias("comp"))
        .repartition(loop_parts, "node")
        .transform(_ckpt)
    )
    labels, changed = _propagate(sym, labels, max_iter, loop_parts, _ckpt)
    if changed:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing): returning partial "
            "labels would yield wrong duplicate clusters.  Raise max_iter — "
            "path-halving converges in O(log diameter) rounds."
        )
    return labels


def _propagate(
    sym: DataFrame, labels: DataFrame, max_iter: int, loop_parts: int, ckpt=None
) -> tuple[DataFrame, int]:
    if ckpt is None:
        ckpt = lambda df: df.localCheckpoint()  # noqa: E731
    changed = 0
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nb_comp"))
        )
        prop = labels.join(nb_min, labels["node"] == nb_min["a"], "left").select(
            "node",
            F.col("comp").alias("old_comp"),
            F.least(F.col("comp"), F.coalesce("nb_comp", F.col("comp"))).alias(
                "comp"
            ),
        )
        # path halving (pointer jumping): also adopt the label OF the label,
        # collapsing chains faster than plain propagation — near-dup graphs
        # contain paths (A~B~C without A~C), not only cliques.  Exactly ONE
        # halving hop per round: a second un-materialized hop doubles the
        # recomputed lineage per hop (the hop-2 self-join re-evaluates the
        # hop-1 join on both sides) and measured 100× slower at sf0.1, and
        # checkpointing between hops costs a job — the single hop is the
        # sweet spot.
        parents = prop.select(
            F.col("node").alias("pnode"), F.col("comp").alias("pcomp")
        )
        # one materialization per round carries (old, new) label pairs, so
        # the convergence count is a cheap scan of checkpointed data; the
        # iterate stays co-partitioned on node so the next round's neighbor
        # and label joins run exchange-free on the labels side
        step = (
            prop.join(parents, prop["comp"] == parents["pnode"], "left")
            .select(
                "node",
                "old_comp",
                F.least(
                    F.col("comp"), F.coalesce("pcomp", F.col("comp"))
                ).alias("comp"),
            )
            .repartition(loop_parts, "node")
            .transform(ckpt)
        )
        changed = step.filter(F.col("comp") != F.col("old_comp")).count()
        labels = step.select("node", "comp")
        if changed == 0:
            break
    return labels, changed


def component_summary(labels: DataFrame) -> DataFrame:
    """Per-component rollup: size and canonical (minimum) member — the
    "which doc do we keep" table of a dedup pipeline."""
    return labels.groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical"),
    )
