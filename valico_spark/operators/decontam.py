"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 used 13-gram overlap,
most open pipelines use 8-13): any document containing a verbatim
n-word sequence from a held-out benchmark is contamination and must be
dropped or audited before training.

Scale shape: the benchmark side is MBs against a corpus of TBs, so its
distinct (gram, bench_id) table is genuinely broadcastable — the join
is then map-side over the exploded corpus grams with NO corpus shuffle;
only the per-doc aggregation shuffles, keyed on doc_id, and only for
documents that actually hit (inner join prunes the rest first). We
leave the broadcast decision to AQE rather than forcing the hint: a
pathological "benchmark" as big as the corpus degrades to a plain
shuffle join instead of OOMing executors (same policy as
``uniqueness_violations``). Grams are xxhash64-hashed before the join
(same move as ``jaccard_pairs_prefix``): the join probe, the broadcast
hashmap, and the hit-side countDistinct then operate on 8-byte longs
instead of ~n-word strings. A corpus/benchmark gram collision would
flag a clean document with p ~ |corpus grams| x |bench grams| / 2^64 —
immaterial even at 10^12 documents, and the count-based outputs are
unchanged (verified value-for-value by the string-keyed SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from valico_spark.operators.dedup import (shingles_of_word_hashes,
                                          word_hashes)
from valico_spark.operators.util import ensure_min_partitions


def benchmark_gram_index(benchmark: DataFrame, n: int = 8,
                         bench_id_col: str = "doc_id",
                         bench_text_col: str = "text") -> DataFrame:
    """``(bench_id, gram)`` — the distinct hashed n-gram relation of a
    benchmark set. Persist it once (benchmark sets are MBs): per-batch
    decontamination then never re-shingles the benchmark text, and an
    updated eval suite just appends its new rows. ``n`` is part of the
    index's identity — lookups must use the same value."""
    return (benchmark
            .select(F.col(bench_id_col).alias("bench_id"),
                    word_hashes(F.col(bench_text_col)).alias("__wh"))
            .select("bench_id",
                    F.explode(shingles_of_word_hashes(F.col("__wh"), n))
                    .alias("gram"))
            .distinct())


def contamination_report(docs: DataFrame,
                         benchmark: DataFrame | None = None,
                         n: int = 8,
                         id_col: str = "doc_id", text_col: str = "text",
                         bench_id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         gram_index: DataFrame | None = None) -> DataFrame:
    """Per-document contamination report against a benchmark corpus.

    Returns one row per *contaminated* document (>=1 shared n-gram):
    ``doc_id``, ``doc_grams`` (distinct n-grams in the document),
    ``hit_grams`` (distinct n-grams also present anywhere in the
    benchmark), ``bench_docs`` (distinct benchmark documents sharing at
    least one gram), ``contamination_r`` (hit_grams/doc_grams rounded
    to 9 places). Documents with zero overlap are absent — at corpus
    scale the report is tiny relative to the input, which is the point.

    Pass EITHER ``benchmark`` (raw text, shingled here) OR
    ``gram_index`` (a persisted :func:`benchmark_gram_index` relation,
    the per-batch posture — built with the same ``n``).

    The dual count-distinct does cost a Catalyst Expand (x2), but it
    runs over the post-join *hit* rows only — already pruned to the
    contaminated sliver — never over the corpus grams.
    """
    if (benchmark is None) == (gram_index is None):
        raise ValueError("pass exactly one of benchmark / gram_index")
    # the zero-gram filter runs on the CHEAP staged word-hash count
    # (>=1 shingle ⇔ >= n words), not on size(grams): a post-projection
    # size filter would be pushed below the projection and inline the
    # whole shingle expression into the filter — evaluated twice per
    # row (the 3x pattern documented in minhash_lsh_candidates)
    corp = (ensure_min_partitions(docs)
            .select(F.col(id_col).alias("doc_id"),
                    word_hashes(F.col(text_col)).alias("__wh"))
            .where(F.size("__wh") >= n)
            .select("doc_id",
                    shingles_of_word_hashes(F.col("__wh"), n)
                    .alias("grams"))
            .withColumn("doc_grams", F.size("grams")))
    corp_g = corp.select("doc_id", "doc_grams",
                         F.explode("grams").alias("gram"))
    if gram_index is not None:
        bench_g = gram_index.select("bench_id", "gram")
    else:
        bench_g = benchmark_gram_index(benchmark, n, bench_id_col,
                                       bench_text_col)
    hits = corp_g.join(bench_g, "gram")
    return (hits.groupBy("doc_id", "doc_grams")
                .agg(F.countDistinct("gram").alias("hit_grams"),
                     F.countDistinct("bench_id").alias("bench_docs"))
                .withColumn(
                    "contamination_r",
                    F.round(F.col("hit_grams")
                            / F.col("doc_grams").cast("double"), 9))
                .select("doc_id", "doc_grams", "hit_grams", "bench_docs",
                        "contamination_r"))


def decontaminate(docs: DataFrame, benchmark: DataFrame | None = None,
                  n: int = 8,
                  max_contamination: float = 0.0,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_id_col: str = "doc_id",
                  bench_text_col: str = "text",
                  gram_index: DataFrame | None = None) -> DataFrame:
    """Drop contaminated documents from ``docs``.

    A document survives iff its contamination fraction is <=
    ``max_contamination`` (default 0: any shared n-gram removes it).
    Implemented as a left anti join of the corpus against the (tiny)
    contaminated-id set — no second scan of the text. Accepts a
    persisted ``gram_index`` exactly like :func:`contamination_report`.
    """
    bad = (contamination_report(docs, benchmark, n=n, id_col=id_col,
                                text_col=text_col,
                                bench_id_col=bench_id_col,
                                bench_text_col=bench_text_col,
                                gram_index=gram_index)
           .where(F.col("contamination_r") > max_contamination)
           .select(F.col("doc_id").alias("__bad_id")))
    return docs.join(bad, docs[id_col] == bad["__bad_id"], "left_anti")
