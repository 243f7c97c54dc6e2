"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink on ``local[$SPARK_GRAFT_CPUS]`` over
``$SPARK_GRAFT_SF_DIR`` — the same methodology as the frozen bench.py
query loop, but selectable per query so optimization iterations don't
pay for the whole slate. ``--explain`` dumps ``explain("formatted")``
instead of timing (for plans/r06 artifacts).

Usage:
  python bench_extra.py q1 q2 ...          # time (min of N runs, default 2)
  python bench_extra.py --runs 3 q1 ...
  python bench_extra.py --explain q1 ...   # print formatted plans
This file is NOT part of the driver contract; bench.py stays frozen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _sink(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from valico_spark.session import get_spark

    args = sys.argv[1:]
    explain = "--explain" in args
    args = [a for a in args if a != "--explain"]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]

    qs = entrymod.queries()
    names = args or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("bench_extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    _sink(spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(10_000))

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if explain:
            print(f"==== {name} ====")
            print(fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"))
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        for r in range(runs):
            t0 = time.time()
            _sink(fn(spark, SF_DIR))
            times.append(round(time.time() - t0, 3))
            print(f"[{name}] run{r}: {times[-1]}s", file=sys.stderr,
                  flush=True)
        out[name] = {"min": min(times), "runs": times}
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    if not explain:
        print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out},
                         separators=(",", ":")))


if __name__ == "__main__":
    main()
