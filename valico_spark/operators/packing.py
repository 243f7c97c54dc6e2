"""Training-sequence packing: assign documents to fixed-token-budget
sequences for LLM pre-training batches.

The serving-scale shape: a GLOBAL greedy packer is a sequential scan
(state resets when a sequence fills) — a non-starter at 10^12 docs. The
standard distributed compromise is concat-and-chunk within parallel
buckets: documents are hash-bucketed, ordered deterministically inside
each bucket, and a sequence boundary falls every ``budget`` tokens of
the bucket's running total. Every step is a window function over the
bucket partition — shuffle = one hash partitioning, no global sort, no
driver state — and the assignment is bit-reproducible on any engine
(the oracle mirrors it in ANSI SQL window functions).

``seq_id = (bucket, chunk)`` where chunk = floor(running_total_before /
budget): a document whose tokens straddle a boundary belongs to the
chunk where it STARTS (readers either trim the overflow or pack with
document truncation downstream — the assignment is what must be
deterministic). Oversized single documents (> budget) monopolize their
chunk and spill into followers' numbering exactly as the running sum
dictates — same policy in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from valico_spark.operators.sampling import sample_hash


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   id_col: str = "doc_id",
                   n_buckets: int = 64) -> DataFrame:
    """Assign every document a (bucket, chunk, start offset) — the
    deterministic packing plan. Columns appended:

    * ``bucket`` — hash bucket (two-step Lehmer hash of the id — the
      same engine-portable hash the sampling operators use, so the
      oracle reproduces it in pure integer SQL);
      packing parallelism, each bucket packs independently;
    * ``chunk`` — sequence number inside the bucket;
    * ``chunk_start`` — token offset of this document inside its
      bucket's concatenated stream (consumers slice with it).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    bucket = F.pmod(sample_hash(F.col(id_col)), F.lit(n_buckets)) \
              .cast("int")
    w = (Window.partitionBy("bucket").orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    out = (df.withColumn("bucket", bucket)
             .withColumn("chunk_start",
                         F.coalesce(F.sum(token_col).over(w), F.lit(0))
                          .cast("long"))
             .withColumn("chunk",
                         F.floor(F.col("chunk_start") / F.lit(budget))
                          .cast("long")))
    return out


def packed_sequence_stats(packed: DataFrame,
                          token_col: str) -> DataFrame:
    """Per-(bucket, chunk) fill report: docs, tokens, fill fraction
    against the budget implied by the packing — the waste metric a
    pipeline tracks. Budget is re-derived per row group by the caller;
    here we just aggregate."""
    return (packed.groupBy("bucket", "chunk")
                  .agg(F.count(F.lit(1)).alias("docs"),
                       F.sum(token_col).cast("long").alias("tokens"),
                       F.min("chunk_start").alias("first_offset")))
