"""Whole-slate cluster-size invariance probe: every ``queries()`` entry
must produce bit-identical canonical results at two parallelism levels.

The north rule requires the engine to run unchanged at N and 4N
executors; throughput scaling is evidenced by bench.py, and THIS tool
evidences the correctness half — no query's RESULT may depend on the
cluster size (partition count, shuffle fan-out, task interleaving).
Each level runs in its own subprocess (fresh JVM, honest isolation,
same pattern as bench._scaling_worker): master local[P] with
spark.sql.shuffle.partitions=P, so every shuffle, window and
applyInPandas stage re-plans at a genuinely different width.

Canonicalization mirrors the driver gate (tools/check_oracles.py):
columns sorted by name, rows sorted by all columns, values stringified
with dtype visible — then md5 over the CSV bytes. A hash equal across
levels means the frames are equal cell-for-cell INCLUDING dtypes.

Usage:
    python tools/cluster_invariance.py [--levels 2 32] [query ...]
    python tools/cluster_invariance.py --worker <parallelism> [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _canon_hash(pdf) -> str:
    from tools.check_oracles import canon_frame

    canon = canon_frame(pdf)
    payload = canon.to_csv(index=False).encode()
    return hashlib.md5(payload).hexdigest()


def _worker(parallelism: int, selected: list[str]) -> int:
    """Run the slate at one parallelism level; print ONE JSON line."""
    import __spark_entry__ as entrymod
    from valico_spark.session import get_spark

    spark = get_spark(
        f"invariance_{parallelism}", master=f"local[{parallelism}]",
        extra_conf={"spark.sql.shuffle.partitions": str(parallelism)})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        if selected and name not in selected:
            continue
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            out[name] = {"rows": len(pdf), "hash": _canon_hash(pdf)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(f"[{parallelism}] {name}: {out[name]}", file=sys.stderr,
              flush=True)
    spark.stop()
    print(json.dumps(out), flush=True)
    return 0


def _run_level(parallelism: int, selected: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(parallelism), *selected],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError(
        f"worker local[{parallelism}] produced no JSON; stderr tail: "
        f"{proc.stderr[-500:]}")


def main(argv: list[str]) -> int:
    if argv[:1] == ["--worker"]:
        return _worker(int(argv[1]), argv[2:])
    levels = [2, 32]
    if argv[:1] == ["--levels"]:
        levels = [int(argv[1]), int(argv[2])]
        argv = argv[3:]
    selected = argv
    lo, hi = levels
    print(f"[invariance] level local[{lo}] ...", file=sys.stderr, flush=True)
    res_lo = _run_level(lo, selected)
    print(f"[invariance] level local[{hi}] ...", file=sys.stderr, flush=True)
    res_hi = _run_level(hi, selected)
    failures = 0
    for name in sorted(set(res_lo) | set(res_hi)):
        a, b = res_lo.get(name), res_hi.get(name)
        if a == b and a is not None and "error" not in a:
            print(f"[ok] {name}: {a['rows']} rows, {a['hash'][:12]}")
        else:
            failures += 1
            print(f"[FAIL] {name}: local[{lo}]={a} local[{hi}]={b}")
    print(f"\n{failures} failures across {len(set(res_lo) | set(res_hi))} "
          f"queries (levels local[{lo}] vs local[{hi}])")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
