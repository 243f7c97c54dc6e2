"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "bench_total", "value": <sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "validation": {"docs": N,
                  "docs_per_sec_local8": r8,
                  "docs_per_sec_local32": r32,
                  "scaling_efficiency": (r32/r8)/4}}

* per-query timings run on ``local[$SPARK_GRAFT_CPUS]`` over
  ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), results sunk to
  the noop writer (no driver collect in the measured path);
* the validation-throughput section is the BASELINE.md two-cluster-size
  proxy: the identical docs-audit job (ruleset violations + span-order
  + uniqueness + referential checks) on the identical synthetic input at
  local[8] and local[32]; efficiency = (rate32/rate8)/4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_DOCS = int(os.environ.get("BENCH_DOCS", "2000000"))


def _sf_label(path: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def _sink(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _docs_audit_job(spark, docs_path: str, media_path: str) -> int:
    """The measured validation pipeline: one pass computing violations +
    span checks, plus uniqueness agg and referential anti-join."""
    from pyspark.sql import functions as F

    from valico_spark.operators import relational, spans
    from valico_spark.operators.validate import validate_dataframe
    from valico_spark.rulesets import DOCS_RULESET

    docs = spark.read.parquet(docs_path)
    media = spark.read.parquet(media_path)

    validated = validate_dataframe(docs, DOCS_RULESET, mode="columns")
    checked = spans.add_span_checks(validated)
    _sink(checked.select("doc_id", "valid", "violations", "spans_ordered",
                         "span_sig"))
    _sink(relational.duplicate_keys(docs, ["doc_id"]))
    refs = (docs.select(F.explode("spans").alias("s"))
                .where(F.col("s.media_ref").isNotNull())
                .select(F.col("s.media_ref").alias("media_ref")))
    _sink(relational.orphans(refs, "media_ref", media, "media_ref",
                             broadcast_parent=True))
    return docs.count()


def _scaling_run(master: str, docs_path: str, media_path: str) -> tuple[float, int]:
    from valico_spark.session import get_spark

    # small maxPartitionBytes: the ~16 MB local fixture must split into
    # enough scan tasks to exercise all cores, mirroring the many-split
    # layout of a real table
    spark = get_spark(f"bench_{master}", master=master, extra_conf={
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": "0",
    })
    try:
        # warm the JVM + parquet footer cache, then measure
        n = _docs_audit_job(spark, docs_path, media_path)
        t0 = time.time()
        _docs_audit_job(spark, docs_path, media_path)
        dt = time.time() - t0
        return dt, n
    finally:
        spark.stop()


def main() -> None:
    from valico_spark.sources.tables import fixture_dir

    t_start = time.time()

    fx = fixture_dir(n_docs=N_DOCS, seed=42)
    docs_path = f"{fx}/docs.parquet"
    media_path = f"{fx}/media_assets.parquet"

    # -- two-parallelism validation throughput (BASELINE.md protocol) ----
    validation = {}
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        t8, n = _scaling_run("local[8]", docs_path, media_path)
        t32, _ = _scaling_run("local[32]", docs_path, media_path)
        r8, r32 = n / t8, n / t32
        validation = {
            "docs": n,
            "sec_local8": round(t8, 3),
            "sec_local32": round(t32, 3),
            "docs_per_sec_local8": round(r8, 1),
            "docs_per_sec_local32": round(r32, 1),
            "scaling_efficiency": round((r32 / r8) / 4.0, 3),
        }

    # -- per-query timings on the driver-provided tables -----------------
    import __spark_entry__ as entrymod
    from valico_spark.session import get_spark

    spark = get_spark("bench_queries", master=f"local[{CPUS}]")
    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        _sink(fn(spark, SF_DIR))
        qtimes[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_start, 3)
    print(json.dumps({
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": _sf_label(SF_DIR),
        "validation": validation,
    }))


if __name__ == "__main__":
    main()
