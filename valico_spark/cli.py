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
    if not (args.ruleset and args.audit_dir and args.run_id):
        ap.error("--ruleset, --audit-dir and --run-id are required "
                 "unless --infer-only")

    with open(args.ruleset) as f:
        ruleset = json.load(f)
    version = 2019 if args.version >= 2019 else 7

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


if __name__ == "__main__":
    sys.exit(main())
