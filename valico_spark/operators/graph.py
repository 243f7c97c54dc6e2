"""Connected components over pair tables (dedup clustering).

Near-dup pair lists (MinHash/SimHash/Jaccard outputs) become usable
only after clustering: every document needs a canonical representative
so the pipeline can keep one copy per cluster. Components of the pair
graph ARE those clusters.

Spark-first shape: HashMin label propagation — each iteration every
node takes the min(label) of itself and its neighbors, expressed as a
join + groupBy-min (both shuffles on the node id; converges in
graph-diameter iterations, and near-dup clusters are shallow). Lineage
is cut with an eager ``localCheckpoint`` per iteration so the plan does
not grow exponentially (the standard iterative-algorithm pattern; at
cluster scale use a checkpoint dir instead). The driver-side loop is
the algorithm's nature (same as GraphX/Pregel), not a collect of data:
per iteration only a changed-row COUNT crosses to the driver.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, a_col: str = "a_id",
                         b_col: str = "b_id",
                         max_iter: int = 20,
                         checkpoint_dir: str | None = None,
                         strict: bool = True,
                         algorithm: str = "star") -> DataFrame:
    """Components of the undirected pair graph: (id, component) with
    component = smallest id reachable. Only ids present in ``pairs``
    are returned (singletons are trivially their own component).

    ``checkpoint_dir``: when given, per-iteration lineage cuts use a
    reliable ``checkpoint()`` to that location instead of
    ``localCheckpoint()`` — localCheckpoint blocks live on executors and
    an executor loss mid-run kills the job, so a real cluster run should
    always pass a (HDFS/object-store) directory. local mode and tests
    default to the executor-local cut.

    ``strict``: HashMin propagates one hop per iteration, so a component
    with diameter > ``max_iter`` would exit the loop with WRONG (split)
    labels. strict=True raises in that case; strict=False downgrades to
    a warning for exploratory runs where approximate clusters are
    acceptable. Near-dup graphs are shallow (a cluster is "everything
    similar to one document"), so hitting the bound usually means the
    pair threshold is too loose, not that max_iter is too small.

    ``algorithm``: ``"star"`` (default) is alternating
    large-star/small-star pointer-jumping (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — converges in O(log n)
    rounds independent of component diameter, so long chains cost
    ~log2(len) rounds instead of len. ``"hashmin"`` keeps the one-hop
    label propagation (diameter-bounded; fewer shuffles per round on
    very shallow graphs). Identical output contract either way.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    if algorithm not in ("star", "hashmin"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if max_iter < 1:
        # zero rounds would silently return raw neighbor minima
        raise ValueError("max_iter must be >= 1")

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # materialize the DIRECTED pairs once BEFORE mirroring: the union's
    # two branches each embed the full upstream pair plan, and exchange
    # reuse only dedups the shuffles — the post-shuffle work (prefix
    # join, exact-Jaccard verify) executed twice (measured 16.2 s -> 9.0
    # s on dedup_clusters at sf1.0, where the PPJoin pipeline is ~8 s)
    directed = _cut(pairs.select(F.col(a_col).alias("u"),
                                 F.col(b_col).alias("v")))
    edges = _cut(directed
                 .union(directed.select(F.col("v").alias("u"),
                                        F.col("u").alias("v")))
                 .distinct())
    if algorithm == "star":
        return _star_components(edges, max_iter, _cut, strict)
    # materialized once (above): every iteration joins against edges,
    # and the upstream pair plan (LSH/Jaccard) is expensive — without
    # the cut it would re-execute per iteration
    labels = (edges.select(F.col("u").alias("id")).distinct()
                   .withColumn("comp", F.col("id")))
    changed = 0
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges["v"] == labels["id"])
                        .groupBy("u").agg(F.min("comp").alias("nbr_comp")))
        # carry the previous label through the projection so convergence
        # detection is a filter-count on the materialized result, not an
        # extra join per iteration
        stepped = _cut(labels.join(nbr_min, labels["id"] == nbr_min["u"],
                                   "left")
                             .select(labels["id"],
                                     F.least(
                                         F.col("comp"),
                                         F.coalesce("nbr_comp",
                                                    F.col("comp"))
                                     ).alias("comp"),
                                     F.col("comp").alias("prev")))
        changed = stepped.where(F.col("comp") != F.col("prev")).count()
        labels = stepped.drop("prev")
        if changed == 0:
            break
    if changed != 0:
        msg = (f"connected_components did not converge in {max_iter} "
               f"iterations ({changed} labels still changing): a "
               f"component's diameter exceeds max_iter and its labels "
               f"are split. Raise max_iter or tighten the pair "
               f"threshold.")
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
    return labels


def _star_components(edges: DataFrame, max_iter: int, _cut,
                     strict: bool) -> DataFrame:
    """Alternating large-star / small-star rounds over the
    (bidirectional, distinct) edge list until fixpoint.

    * large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u),
      v > u — strictly-greater neighbors hook onto the local minimum.
    * small-star(u): over smaller-endpoint-directed edges (v < u):
      m = min(N<(u)); emit (v, m) for v ∈ N<(u) and (u, m).

    Each round is one groupBy + one shuffle join + distinct; the edge
    set is a star forest (child → component-min) at fixpoint, detected
    by a one-row (count, xxhash64-sum) fingerprint — no exceptAll scan.
    Converges in O(log n) rounds regardless of diameter (the HashMin
    alternative needs diameter rounds)."""
    nodes = edges.select(F.col("u").alias("id")).distinct()
    cur = edges.where(F.col("u") != F.col("v"))

    def fingerprint(e: DataFrame):
        h = F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))
        row = e.agg(F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum(h), F.lit(0)).alias("h")).collect()[0]
        return (row["n"], row["h"])

    def canon(e: DataFrame) -> DataFrame:
        # undirected canonical form (big, small) for the fingerprint
        return e.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v")).distinct()

    prev_fp = None
    converged = False
    for _ in range(max_iter):
        both = cur.union(cur.select(F.col("v").alias("u"),
                                    F.col("u").alias("v"))).distinct()
        mins = both.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        large = (both.join(mins, "u")
                     .where(F.col("v") > F.col("u"))
                     .select(F.col("v").alias("u"), F.col("m").alias("v")))
        # small-star over edges directed at the smaller endpoint
        directed = large.select(F.greatest("u", "v").alias("u"),
                                F.least("u", "v").alias("v")).distinct()
        smins = directed.groupBy("u").agg(F.min("v").alias("m"))
        small = (directed.join(smins, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .union(directed.join(smins, "u")
                        .select(F.col("u"), F.col("m").alias("v")))
                 .where(F.col("u") != F.col("v"))
                 .distinct())
        cur = _cut(small)
        fp = fingerprint(canon(cur))
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        msg = (f"star connected_components did not reach a fixpoint in "
               f"{max_iter} rounds — raise max_iter (needs ~log2(nodes) "
               f"rounds).")
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=3)
    # fixpoint edge set is (child, parent=component-min); roots have no
    # outgoing edge and label themselves
    parents = (cur.select(F.greatest("u", "v").alias("id"),
                          F.least("u", "v").alias("comp"))
                  .groupBy("id").agg(F.min("comp").alias("comp")))
    return (nodes.join(parents, "id", "left")
                 .select("id", F.coalesce("comp", F.col("id"))
                         .alias("comp")))


def dedup_clusters(pairs: DataFrame, a_col: str = "a_id",
                   b_col: str = "b_id",
                   checkpoint_dir: str | None = None,
                   algorithm: str = "hashmin") -> DataFrame:
    """(doc_id, component, cluster_size) for every clustered document —
    the keep-one-per-cluster decision table (keep id == component).

    Defaults to HashMin: near-dup clusters are shallow by construction
    (everything similar to one document), where one-hop propagation
    converges in a few 2-shuffle rounds and measures ~25% faster than
    the star rounds; the non-convergence raise still guards the deep
    case, and ``algorithm="star"`` is one argument away."""
    comp = connected_components(pairs, a_col, b_col,
                                checkpoint_dir=checkpoint_dir,
                                algorithm=algorithm)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (comp.join(sizes, "comp")
                .select(F.col("id").alias("doc_id"),
                        F.col("comp").alias("component"),
                        F.col("cluster_size")))


def select_representatives(clusters: DataFrame, scored: DataFrame,
                           score_col: str,
                           id_col: str = "doc_id") -> DataFrame:
    """Pick the cluster survivor by QUALITY, not accident: per
    component, ``keep`` marks the highest-``score_col`` document (ties
    to the smallest id — deterministic on any engine). The standard
    dedup keep-rules (longest doc, highest quality score, earliest
    crawl) are all this operator with a different score column.

    One join on the doc id + a window over the component — both keyed
    shuffles bounded by the clustered sliver, never the corpus.
    """
    from pyspark.sql.window import Window

    j = clusters.join(
        scored.select(F.col(id_col).alias("doc_id"),
                      F.col(score_col).alias("__score")), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("__score"), F.asc("doc_id"))
    return (j.withColumn("keep", F.row_number().over(w) == 1)
             .withColumnRenamed("__score", score_col))
