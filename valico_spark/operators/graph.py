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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, a_col: str = "a_id",
                         b_col: str = "b_id",
                         max_iter: int = 20) -> DataFrame:
    """Components of the undirected pair graph: (id, component) with
    component = smallest id reachable. Only ids present in ``pairs``
    are returned (singletons are trivially their own component)."""
    edges = (pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
                  .union(pairs.select(F.col(b_col).alias("u"),
                                      F.col(a_col).alias("v")))
                  .distinct()
                  # materialize once: every iteration joins against edges,
                  # and the upstream pair plan (LSH/Jaccard) is expensive —
                  # without the cut it would re-execute per iteration
                  .localCheckpoint(eager=True))
    labels = (edges.select(F.col("u").alias("id")).distinct()
                   .withColumn("comp", F.col("id")))
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges["v"] == labels["id"])
                        .groupBy("u").agg(F.min("comp").alias("nbr_comp")))
        # carry the previous label through the projection so convergence
        # detection is a filter-count on the materialized result, not an
        # extra join per iteration
        stepped = (labels.join(nbr_min, labels["id"] == nbr_min["u"],
                               "left")
                         .select(labels["id"],
                                 F.least(
                                     F.col("comp"),
                                     F.coalesce("nbr_comp", F.col("comp"))
                                 ).alias("comp"),
                                 F.col("comp").alias("prev"))
                         .localCheckpoint(eager=True))
        changed = stepped.where(F.col("comp") != F.col("prev")).count()
        labels = stepped.drop("prev")
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame, a_col: str = "a_id",
                   b_col: str = "b_id") -> DataFrame:
    """(doc_id, component, cluster_size) for every clustered document —
    the keep-one-per-cluster decision table (keep id == component)."""
    comp = connected_components(pairs, a_col, b_col)
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
