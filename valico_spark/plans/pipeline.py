"""Composed corpus-curation pipeline with single-pass attrition
accounting — the end-to-end recipe a training-data run actually
executes: validate → quality/language/blocklist filter → near-dup
dedup → benchmark decontamination, each stage recording WHY every
dropped row was dropped.

Reference scope: the reference validates one document at a time and has
no pipeline tier; this module is the engine-level composition of the
operators the rest of the package already verifies individually
(validate.py, text.py, dedup.py, graph.py, decontam.py).

Scale design — the whole point of tagging instead of filtering:

* **Row-local stages fuse.** A ``row_stage`` contributes one boolean
  expression to a single ``CASE WHEN`` chain evaluated in ONE codegen
  projection over the corpus — five filter stages cost one scan, zero
  shuffles, and the chain order gives exact sequential semantics (a
  row dropped by stage k is never charged to stage k+1).
* **Set stages see only survivors.** A ``set_stage`` (near-dup dedup,
  decontamination — anything that needs a join or an aggregation)
  receives the survivors-so-far frame and returns the ids to drop; the
  ids come back as one keyed left join whose right side is the dropped
  sliver, never the corpus.
* **The attrition report is ONE aggregation** over the final tagged
  frame (``groupBy(drop_reason)``), not a count-action per stage — at
  100 TB per-stage ``.count()`` checkpoints would double the cost of
  the whole pipeline.

Usage::

    stages = [
        row_stage("invalid", invalid_pred(ruleset, docs.schema)),
        row_stage("low_quality",
                  lambda d: quality_score_col(F.col("text")) < 0.3),
        set_stage("near_dup", minhash_drop_ids()),
        set_stage("contaminated", decontam_drop_ids(benchmark)),
    ]
    curated, tagged, report = curate(docs, stages)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REASON = "drop_reason"


@dataclass(frozen=True)
class Stage:
    name: str
    kind: str  # "row" | "set"
    fn: Callable[[DataFrame], Any]


def row_stage(name: str,
              pred: Callable[[DataFrame], Column]) -> Stage:
    """A row-local drop rule: ``pred(df)`` returns a boolean Column
    (TRUE = drop). Evaluated over every not-yet-dropped row inside the
    shared projection — adds no scan and no shuffle."""
    return Stage(name, "row", pred)


def set_stage(name: str,
              drop_ids: Callable[[DataFrame], DataFrame]) -> Stage:
    """A set-valued drop rule: ``drop_ids(survivors)`` returns a
    one-column DataFrame of ids to drop (any column name; duplicates
    fine). Use for anything needing a join/aggregation over the
    surviving corpus — near-dup clusters, contamination probes."""
    return Stage(name, "set", drop_ids)


def _apply_row_stage(tagged: DataFrame, st: Stage) -> DataFrame:
    pred = st.fn(tagged)
    return tagged.withColumn(
        _REASON,
        F.coalesce(F.col(_REASON), F.when(pred, F.lit(st.name))))


def curate(df: DataFrame, stages: list[Stage],
           id_col: str = "doc_id") \
        -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run ``stages`` sequentially and return
    ``(curated, tagged, report)``:

    * ``curated`` — the surviving rows, original columns;
    * ``tagged`` — every input row + ``drop_reason`` (null = kept),
      the audit-tier artifact (write it next to the curated output and
      any dropped row is explainable without re-running anything);
    * ``report`` — ``(stage, n_rows)`` attrition counts in stage
      order, with a final ``kept`` row; one aggregation, lazily
      evaluated.

    Stage names must be unique and not ``"kept"``. Sequential
    semantics: each stage only ever drops rows that survived every
    earlier stage, and ``drop_reason`` records the FIRST stage that
    dropped the row — identical to running the stages as successive
    filters, for the cost of one corpus scan plus one keyed join per
    set stage.

    NULL ids: set stages drop by id EQUALITY, so a row whose
    ``id_col`` is null can never be dropped by a set stage (null never
    equi-joins). Corpora with nullable ids should lead with a row
    stage — ``row_stage("null_id", lambda d: F.col(id_col).isNull())``
    or a ruleset ``required`` — so null-id rows are tagged before any
    set stage runs; a null-safe join here would instead merge every
    null-id row into one drop decision, which is worse.
    """
    names = [s.name for s in stages]
    if len(set(names)) != len(names) or "kept" in names:
        raise ValueError("stage names must be unique and not 'kept'")

    tagged = df.withColumn(_REASON, F.lit(None).cast("string"))
    for st in stages:
        if st.kind == "row":
            tagged = _apply_row_stage(tagged, st)
        elif st.kind == "set":
            survivors = (tagged.where(F.col(_REASON).isNull())
                               .drop(_REASON))
            ids = st.fn(survivors)
            if len(ids.columns) != 1:
                raise ValueError(
                    f"set stage {st.name!r} must return exactly one "
                    f"id column, got {ids.columns}")
            drop = (ids.select(F.col(ids.columns[0]).alias("__drop_id"))
                       .distinct()
                       .withColumn("__hit", F.lit(True)))
            tagged = (tagged.join(
                          drop,
                          tagged[id_col] == drop["__drop_id"], "left")
                      .withColumn(
                          _REASON,
                          F.coalesce(F.col(_REASON),
                                     F.when(F.col("__hit"),
                                            F.lit(st.name))))
                      .drop("__drop_id", "__hit"))
        else:  # pragma: no cover - Stage constructors prevent this
            raise ValueError(f"unknown stage kind {st.kind!r}")

    curated = tagged.where(F.col(_REASON).isNull()).drop(_REASON)
    order = {n: i for i, n in enumerate(names)}
    order["kept"] = len(names)
    order_expr = F.element_at(
        F.create_map(*[x for n, i in order.items()
                       for x in (F.lit(n), F.lit(i))]),
        F.coalesce(F.col(_REASON), F.lit("kept")))
    report = (tagged
              .groupBy(F.coalesce(F.col(_REASON), F.lit("kept"))
                        .alias("stage"))
              .agg(F.count(F.lit(1)).alias("n_rows"))
              .orderBy(order_expr))
    return curated, tagged, report


def curate_stream(stream_df: DataFrame, stages: list[Stage]) -> DataFrame:
    """The in-flight curation tier: apply ROW stages to a streaming
    DataFrame, returning the tagged stream (``drop_reason`` null =
    kept). Row stages are pure projections, so the exact batch
    expressions run unchanged per micro-batch — zero state, zero
    shuffle, and batch/stream decisions cannot drift because they ARE
    the same Column objects.

    Set stages are REFUSED: a near-dup cluster or a contamination probe
    is defined over a corpus snapshot, not a micro-batch, so computing
    it in-stream would silently change semantics (per-batch dedup ≠
    corpus dedup). The streaming posture for those is: run the row tier
    in-flight (this function, dropping the bulk cheaply at ingest),
    land the survivors, and run the set stages as the periodic batch
    compaction over the landed table. For streaming EXACT dedup within
    a bounded horizon, compose ``validate_stream.dedup_stream``
    upstream of this tier.
    """
    bad = [s.name for s in stages if s.kind != "row"]
    if bad:
        raise ValueError(
            f"curate_stream accepts row stages only; set stages {bad} "
            "belong in the periodic batch compaction (see docstring)")
    tagged = stream_df.withColumn(_REASON, F.lit(None).cast("string"))
    for st in stages:
        tagged = _apply_row_stage(tagged, st)
    return tagged


def stream_attrition_counts(tagged: DataFrame, time_col: str,
                            window: str = "1 minute",
                            watermark: str = "5 minutes") -> DataFrame:
    """Watermark-windowed attrition monitoring over a tagged stream:
    ``(window_start, window_end, stage, n_rows)`` per window — the
    streaming analogue of ``curate``'s report (same one-aggregation
    shape, state bounded by windows x stages)."""
    return (tagged
            .withWatermark(time_col, watermark)
            .groupBy(F.window(time_col, window).alias("w"),
                     F.coalesce(F.col(_REASON), F.lit("kept"))
                      .alias("stage"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "stage", "n_rows"))


# -- ready-made stage factories (the standard curation recipe) -----------

def invalid_stage(ruleset: Any, schema, version: int | None = None,
                  name: str = "invalid") -> Stage:
    """Drop rows the compiled ruleset rejects. Compiles the violations
    Column up front (compiler/columns.py) so the check fuses into the
    shared row-stage projection; raises UnsupportedRule at BUILD time
    if the ruleset needs the Arrow walker — wrap validate_dataframe in
    a set_stage for that case (kept explicit: a silent fallback would put
    a Python stage in what callers believe is a pure-codegen scan)."""
    from valico_spark.compiler.columns import compile_ruleset
    from valico_spark.compiler.pyvalidator import DRAFT7

    viol = compile_ruleset(ruleset, schema,
                           version=DRAFT7 if version is None else version)
    return row_stage(name, lambda df: F.size(viol) > 0)


def low_quality_stage(min_score: float, text_col: str = "text",
                      name: str = "low_quality") -> Stage:
    """Drop rows scoring under the composite quality threshold
    (text.quality_score_col — formula-identical to the oracle-checked
    quality_scores). Null text scores null → never TRUE here, so null
    text is the validation/min-length stages' concern, by design."""
    from valico_spark.operators.text import quality_score_col

    return row_stage(
        name, lambda df: quality_score_col(F.col(text_col)) < min_score)


def wrong_lang_stage(keep_langs: list[str], text_col: str = "text",
                     name: str = "wrong_lang") -> Stage:
    """Drop rows whose predicted language is outside ``keep_langs``
    (text.pred_lang_col — decision-identical to lang_id)."""
    from valico_spark.operators.text import pred_lang_col

    keep = [l.lower() for l in keep_langs]
    return row_stage(
        name,
        lambda df: ~pred_lang_col(F.col(text_col)).isin(keep))


def blocklist_stage(blocklist: list[str], text_col: str = "text",
                    name: str = "blocklisted") -> Stage:
    from valico_spark.operators.text import blocklisted_domain_pred

    return row_stage(
        name,
        lambda df: blocklisted_domain_pred(F.col(text_col), blocklist))


def near_dup_stage(jaccard_threshold: float = 0.8,
                   num_hashes: int = 32, bands: int = 8, n: int = 5,
                   id_col: str = "doc_id", text_col: str = "text",
                   score_col: str | None = None,
                   name: str = "near_dup") -> Stage:
    """Drop every near-duplicate except one survivor per cluster:
    MinHash-LSH with exact-duplicate pre-collapse (the 100-TB posture,
    dedup.minhash_dedup) → connected components → keep-best (longest
    text by default, or ``score_col``)."""
    from valico_spark.operators.dedup import minhash_dedup
    from valico_spark.operators.graph import (
        dedup_clusters, select_representatives)

    def drop_ids(survivors: DataFrame) -> DataFrame:
        pairs = minhash_dedup(
            survivors, jaccard_threshold=jaccard_threshold,
            num_hashes=num_hashes, bands=bands, n=n,
            id_col=id_col, text_col=text_col, precollapse_exact=True)
        clusters = dedup_clusters(pairs)
        if score_col is None:
            scored = survivors.select(
                F.col(id_col),
                F.coalesce(F.length(text_col), F.lit(0))
                 .alias("__len"))
            sc = "__len"
        else:
            scored, sc = survivors, score_col
        reps = select_representatives(clusters, scored, sc,
                                      id_col=id_col)
        # select_representatives emits the id as "doc_id" regardless of
        # the input id column name
        return reps.where(~F.col("keep")).select("doc_id")

    return set_stage(name, drop_ids)


def bad_spans_stage(spans_col: str = "spans",
                    name: str = "bad_spans") -> Stage:
    """Drop interleaved documents whose span sequence violates the
    offset-ordering invariant (spans.spans_strictly_increasing — the
    north-rule per-document structural check) — row-local, fuses."""
    from valico_spark.operators.spans import spans_strictly_increasing

    return row_stage(
        name,
        lambda df: ~spans_strictly_increasing(F.col(spans_col)))


def semantic_dup_stage(threshold: float = 0.95,
                       id_col: str = "doc_id",
                       vec_col: str = "embedding",
                       centroids=None,
                       n_centroids: int | None = None,
                       name: str = "semantic_dup") -> Stage:
    """Drop semantic near-duplicates by embedding similarity
    (similarity.semantic_dedup, SemDeDup-style cell-blocked): every
    vector with a lower-id neighbor at cosine >= threshold in its cell
    is dropped, the lowest id per group survives. Requires ``vec_col``
    on the corpus; rows with null embeddings are untouched (no vector,
    no similarity evidence)."""
    from valico_spark.operators.similarity import semantic_dedup

    def drop_ids(survivors: DataFrame) -> DataFrame:
        rep = semantic_dedup(
            survivors.where(F.col(vec_col).isNotNull()),
            threshold=threshold, id_col=id_col, vec_col=vec_col,
            centroids=centroids, n_centroids=n_centroids)
        return rep.select("dropped_id")

    return set_stage(name, drop_ids)


def bad_media_stage(payload_col: str = "payload",
                    allowed_types: list[str] | None = None,
                    name: str = "bad_media") -> Stage:
    """Drop rows whose binary payload fails magic-number sniffing
    (multimodal.sniff_media_type — pure JVM expression, fuses) or
    sniffs to a type outside ``allowed_types``. Null payloads are
    dropped too: a media row without bytes is malformed by definition
    here; text-only corpora simply omit this stage."""
    from valico_spark.operators.multimodal import sniff_media_type

    def pred(df: DataFrame) -> Column:
        sniffed = sniff_media_type(F.col(payload_col))
        bad = sniffed.isNull()
        if allowed_types is not None:
            bad = bad | ~sniffed.isin(list(allowed_types))
        return F.col(payload_col).isNull() | bad

    return row_stage(name, pred)


def decontam_stage(benchmark: DataFrame, n: int = 8,
                   max_contamination: float = 0.0,
                   id_col: str = "doc_id", text_col: str = "text",
                   bench_id_col: str = "doc_id",
                   bench_text_col: str = "text",
                   name: str = "contaminated") -> Stage:
    """Drop rows sharing n-grams with the benchmark beyond the allowed
    contamination fraction (decontam.contamination_report)."""
    from valico_spark.operators.decontam import contamination_report

    def drop_ids(survivors: DataFrame) -> DataFrame:
        rep = contamination_report(
            survivors, benchmark, n=n, id_col=id_col,
            text_col=text_col, bench_id_col=bench_id_col,
            bench_text_col=bench_text_col)
        return (rep.where(F.col("contamination_r") > max_contamination)
                   .select("doc_id"))

    return set_stage(name, drop_ids)
