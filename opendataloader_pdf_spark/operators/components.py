"""Connected components over an edge list — the missing piece of a
web-scale dedup pipeline: near-dup detectors (MinHash-LSH, n-gram
Jaccard, embedding cosine) emit *pairs*; choosing one canonical document
per duplicate *group* requires the transitive closure of those pairs.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014). Each round is two shuffle stages expressed as
plain groupBy-min aggregations + equi-joins, so Catalyst handles partial
aggregation and AQE handles skewed reducers; convergence is O(log² n)
rounds worst case and 2–4 rounds on real dedup graphs (near-clique
components). This beats naive label propagation, whose round count is
the graph DIAMETER — a 10⁶-doc boilerplate chain would need 10⁶ rounds
under propagation but ~20 here.

Scale notes:
- Every round materializes via ``localCheckpoint(eager=True)``: without
  it the iteration's lineage nests joins O(rounds) deep and Catalyst
  re-analyzes (and may re-execute) the whole history each round. On a
  cluster, checkpointed blocks live on executors (StorageLevel
  MEMORY_AND_DISK) — no driver traffic.
- Convergence test is a two-long fingerprint aggregate
  (count + sum(xxhash64(src, dst))), not a subtract/except join — one
  narrow pass over the (already checkpointed) edges per round.
- A max-degree node appears in one reducer during large-star; the
  emitted edge count per round is bounded by |E| (lemma 4.1 of the
  paper), so no round amplifies the data.

Reference parity: the reference engine has no graph operator — this is
part of the training-data-pipeline family layered on the dedup ops
(SURVEY.md §2 LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: connect every neighbor v > u to
    m(u) = min(N(u) ∪ {u}).

    Input edges may be in any orientation; the symmetrized view is built
    here. Output edges satisfy src > dst (strictly) except none — emitted
    as (v, m) with v > u ≥ m, v ≠ m guaranteed by v > u ≥ m."""
    sym = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: for each node u over its SMALLER neighbors
    L(u) = {v ∈ N(u) : v < u}, connect every node of L(u) ∪ {u} except
    the minimum m to m. Output edges satisfy src > dst."""
    canon = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    re_lo = (
        canon.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    re_hi = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return re_lo.unionAll(re_hi).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # pmod to 2^31 keeps the ANSI-mode sum overflow-free below ~4e9 edges
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(2**31))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 30,
) -> DataFrame:
    """Transitive closure of an undirected pair list → per-node component
    labels.

    Returns (node, component) with component = MIN node id of the
    component — deterministic, so downstream "keep the canonical doc"
    is just ``component == node``. Only nodes that appear in ``pairs``
    are returned (isolated docs are their own component; callers attach
    them with a left join + coalesce, avoiding a row per untouched doc).

    ``src``/``dst`` must be mutually orderable (ints, longs, strings).
    Raises RuntimeError if not converged within ``max_iter`` rounds —
    the alternating-star bound is O(log² n), so 30 covers any feasible
    input and a non-convergence signals a bug, not a big graph.
    """
    # localCheckpoint blocks are NOT released by DataFrame.unpersist (the
    # storage belongs to the internal checkpointed RDD, reaped only when
    # the driver GCs the object) — without explicit release the loop
    # holds O(rounds x |E|) executor storage. Each checkpointed frame's
    # plan is a LogicalRDD wrapping exactly OUR checkpoint RDD, so its id
    # is read straight off the plan and only that id is ever released —
    # caller-owned caches that happen to materialize during our jobs are
    # untouched. The final round's checkpoint stays live (the returned
    # DataFrame reads it).
    jsc = pairs.sparkSession.sparkContext._jsc.sc()

    def _ckpt_rdd_id(df: DataFrame) -> int | None:
        plan = df._jdf.queryExecution().analyzed()
        try:
            return int(plan.rdd().id())
        except Exception:
            return None  # unexpected plan shape: skip release, stay safe

    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    owned = _ckpt_rdd_id(edges)
    fp = _fingerprint(edges)
    for _ in range(max_iter):
        prev = edges
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        fresh = _ckpt_rdd_id(edges)
        nfp = _fingerprint(edges)
        converged = False
        if nfp == fp:
            # exactness backstop: the (count, hash-sum mod 2^31)
            # fingerprint can collide between different edge sets
            # (~2^-31/round); before declaring the fixpoint, prove set
            # equality with ONE anti-join — counts already match via
            # the fingerprint, so one-sided emptiness suffices. Runs
            # only on fingerprint match, so steady-state rounds pay
            # nothing extra.
            converged = (
                edges.join(prev, ["src", "dst"], "left_anti").count() == 0
            )
        if owned is not None:
            jsc.unpersistRDD(owned, False)
        owned = fresh
        if converged:
            break
        fp = nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged star graph: edges = (node, root), root < node; roots
    # themselves need a self row
    return edges.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    ).unionAll(
        edges.select("dst").distinct().select(
            F.col("dst").alias("node"), F.col("dst").alias("component")
        )
    )
