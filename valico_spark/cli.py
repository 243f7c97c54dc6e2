"""spark-submit entrypoint for audit runs (north_star launch contract).

    spark-submit --py-files valico_spark.zip -m valico_spark.cli \\
        --input /data/docs --ruleset rules.json --audit-dir /audit \\
        --run-id nightly-2026-08-16 [--resume] [--buckets 256]

or locally: ``python -m valico_spark.cli ...``. The run is
checkpoint-resumable: re-launching with the same run id processes only
buckets missing from the manifest (plans/audit.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def _norm_version(v: int) -> int:
    """One place for the draft coercion rule (audit + curate paths)."""
    return 2019 if v >= 2019 else 7


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="valico_spark")
    ap.add_argument("--input", required=True,
                    help="parquet path of the documents table")
    ap.add_argument("--ruleset",
                    help="path to the ruleset JSON (valico dialect); "
                         "omit with --infer-only")
    ap.add_argument("--infer-only", action="store_true",
                    help="print a suggested draft-07 ruleset inferred "
                         "from --input (two bounded agg passes) and exit")
    ap.add_argument("--curate", action="store_true",
                    help="run the curation pipeline (plans/pipeline.py) "
                         "instead of an audit: writes tagged + curated "
                         "parquet and an attrition report under "
                         "--output-dir")
    ap.add_argument("--output-dir",
                    help="(--curate) output directory")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="(--curate) drop docs under this composite "
                         "quality score")
    ap.add_argument("--langs", default=None,
                    help="(--curate) comma-separated language allowlist")
    ap.add_argument("--blocklist-file", default=None,
                    help="(--curate) file with one blocked domain per "
                         "line")
    ap.add_argument("--near-dup", action="store_true",
                    help="(--curate) drop near-duplicates (MinHash-LSH "
                         "with exact-dup pre-collapse, keep longest)")
    ap.add_argument("--jaccard", type=float, default=0.8,
                    help="(--curate) near-dup Jaccard threshold")
    ap.add_argument("--benchmark", default=None,
                    help="(--curate) benchmark parquet for 8-gram "
                         "decontamination")
    ap.add_argument("--remove-repeated-spans", type=int, default=None,
                    metavar="N",
                    help="rewrite the curated corpus with corpus-"
                         "duplicated N-word spans removed (exact-"
                         "substring dedup, keep-first semantics)")
    ap.add_argument("--mixture", default=None,
                    help="(--curate) JSON source->weight map: downsample "
                         "the curated corpus to this token mixture "
                         "(max-feasible-corpus rule, operators/export.py)")
    ap.add_argument("--source-col", default="source",
                    help="(--curate --mixture) source column")
    ap.add_argument("--token-col", default="n_chars",
                    help="(--curate --mixture) token-mass column; after "
                         "--remove-repeated-spans, n_words carries fresh "
                         "post-rewrite counts while input-derived counts "
                         "like n_chars go stale")
    ap.add_argument("--shards", type=int, default=None,
                    help="(--curate) also write the final corpus as N "
                         "hash-balanced parquet shards with a manifest")
    ap.add_argument("--audit-dir")
    ap.add_argument("--run-id")
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--master", default=None)
    ap.add_argument("--version", type=int, default=7,
                    help="schema draft: 7 or 2019")
    args = ap.parse_args(argv)

    from valico_spark.operators.validate import validate_dataframe
    from valico_spark.plans.audit import AuditRun
    from valico_spark.session import get_spark

    if args.infer_only:
        from valico_spark.operators.infer import infer_ruleset

        spark = get_spark("valico_infer", master=args.master)
        docs = spark.read.parquet(args.input)
        print(json.dumps(infer_ruleset(docs), indent=2, default=str))
        return 0
    if args.curate:
        if not args.output_dir:
            ap.error("--curate requires --output-dir")
        return _curate_main(args)
    if not (args.ruleset and args.audit_dir and args.run_id):
        ap.error("--ruleset, --audit-dir and --run-id are required "
                 "unless --infer-only")

    with open(args.ruleset) as f:
        ruleset = json.load(f)
    version = _norm_version(args.version)

    spark = get_spark(f"valico_audit_{args.run_id}", master=args.master)
    docs = spark.read.parquet(args.input)
    run = AuditRun(spark, args.audit_dir, args.run_id,
                   n_buckets=args.buckets)

    pending = run.pending_buckets()
    print(f"run {args.run_id}: {len(pending)}/{args.buckets} buckets pending")
    metrics = run.run(
        docs, args.key,
        lambda df: validate_dataframe(df, ruleset, version=version))
    total = sum(m["docs"] for m in run.metrics())
    bad = sum(m["docs"] - m["valid_docs"] for m in run.metrics())
    print(json.dumps({"run_id": args.run_id, "processed_buckets":
                      len(metrics), "total_docs": total,
                      "invalid_docs": bad}))
    return 0


def _curate_main(args) -> int:
    """Curation run: ONE pipeline execution writes the tagged table;
    the curated table and the attrition report derive from the WRITTEN
    tagged parquet (two cheap scans) instead of re-executing the
    pipeline lineage per output — at 100 TB re-running the dedup joins
    to produce each artifact would triple the job."""
    import os

    from pyspark.sql import functions as F

    from valico_spark.plans import pipeline as P
    from valico_spark.session import get_spark

    spark = get_spark("valico_curate", master=args.master)
    docs = spark.read.parquet(args.input)

    stages = []
    if args.ruleset:
        with open(args.ruleset) as f:
            ruleset = json.load(f)
        version = _norm_version(args.version)
        from valico_spark.compiler.columns import UnsupportedRule
        try:
            stages.append(P.invalid_stage(ruleset, docs.schema,
                                          version=version))
        except UnsupportedRule:
            # walker-only ruleset: validate as a set stage (Arrow path)
            from valico_spark.operators.validate import validate_dataframe

            stages.append(P.set_stage(
                "invalid",
                lambda s: validate_dataframe(s, ruleset, version=version)
                .where(~F.col("valid")).select(args.key)))
    if args.min_quality is not None:
        stages.append(P.low_quality_stage(args.min_quality))
    if args.langs:
        langs = [x.strip() for x in args.langs.split(",") if x.strip()]
        stages.append(P.wrong_lang_stage(langs))
    if args.blocklist_file:
        with open(args.blocklist_file) as f:
            domains = [ln.strip() for ln in f if ln.strip()]
        stages.append(P.blocklist_stage(domains))
    if args.near_dup:
        stages.append(P.near_dup_stage(jaccard_threshold=args.jaccard,
                                       id_col=args.key))
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        stages.append(P.decontam_stage(bench, id_col=args.key))
    if not stages:
        print("no curation stages configured; pass --ruleset / "
              "--min-quality / --langs / --blocklist-file / --near-dup "
              "/ --benchmark", file=sys.stderr)
        return 2

    _, tagged, _ = P.curate(docs, stages, id_col=args.key)
    out = args.output_dir
    tagged.write.mode("overwrite").parquet(os.path.join(out, "tagged"))
    t = spark.read.parquet(os.path.join(out, "tagged"))
    (t.where(F.col("drop_reason").isNull()).drop("drop_reason")
      .write.mode("overwrite").parquet(os.path.join(out, "curated")))
    counts = {r["stage"]: r["n"] for r in
              t.groupBy(F.coalesce("drop_reason", F.lit("kept"))
                         .alias("stage"))
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    report = {"input_rows": sum(counts.values()),
              "kept_rows": counts.get("kept", 0),
              "stages": [s.name for s in stages],
              "dropped": {s.name: counts.get(s.name, 0)
                          for s in stages}}

    # optional export tail: curated -> despanned -> mixture -> shards,
    # each artifact derived from the previous WRITTEN table (one
    # execution per tier)
    final_path = os.path.join(out, "curated")
    if args.remove_repeated_spans:
        from valico_spark.operators.dedup import remove_repeated_spans

        try:
            cleaned = remove_repeated_spans(
                spark.read.parquet(final_path),
                n=args.remove_repeated_spans, id_col=args.key)
        except ValueError as e:
            # e.g. the input corpus carries clashing stat columns —
            # record the diagnostic AND say so loudly: the user asked
            # for exact-substring dedup and is getting a corpus without
            # it, which must not be discoverable only via a report key
            report["repeated_spans_error"] = str(e)
            print(f"WARNING: --remove-repeated-spans skipped, shipping "
                  f"the curated corpus UNREWRITTEN: {e}",
                  file=sys.stderr, flush=True)
        else:
            final_path = os.path.join(out, "despanned")
            cleaned.write.mode("overwrite").parquet(final_path)
            stats = (spark.read.parquet(final_path)
                     .agg(F.count(F.lit(1)).alias("docs"),
                          F.sum((F.col("n_removed") > 0).cast("long"))
                           .alias("docs_rewritten"),
                          F.sum("n_removed").alias("words_removed"))
                     .collect()[0])
            report["repeated_spans"] = {
                "n": args.remove_repeated_spans,
                "docs": int(stats["docs"]),
                "docs_rewritten": int(stats["docs_rewritten"] or 0),
                "words_removed": int(stats["words_removed"] or 0)}
    if args.mixture:
        from valico_spark.operators.export import mixture_sample

        weights = json.loads(args.mixture)
        cur = spark.read.parquet(final_path)
        try:
            sampled, mix_report = mixture_sample(
                cur, weights, source_col=args.source_col,
                id_col=args.key, token_col=args.token_col)
        except ValueError as e:
            # e.g. curation dropped a weighted source entirely — record
            # the diagnostic and ship the curated corpus unsampled
            # instead of crashing after all the expensive work
            report["mixture_error"] = str(e)
        else:
            final_path = os.path.join(out, "mixture")
            sampled.write.mode("overwrite").parquet(final_path)
            report["mixture"] = [r.asDict()
                                 for r in mix_report.collect()]
            report["mixture_rows"] = (
                spark.read.parquet(final_path).count())
    if args.shards:
        from valico_spark.operators.export import write_shards

        manifest = write_shards(spark.read.parquet(final_path),
                                os.path.join(out, "shards"),
                                args.shards, id_col=args.key)
        report["shards"] = {int(r["shard"]): int(r["n_rows"])
                           for r in manifest.collect()}

    with open(os.path.join(out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
