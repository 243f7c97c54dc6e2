"""Mega-bucket scale stress: measure, at an amplified corpus, that the
two defenses added for the 100x web-corpus failure mode actually work:

1. WITHOUT pre-collapse, the banded MinHash join's group-size rail
   (``cap_group_size``) aborts LOUDLY the moment a hot (band, bucket)
   group exceeds the cap — instead of silently materializing O(copies^2)
   candidate pairs.
2. WITH ``precollapse_exact=True`` (the documented 100-TB posture) the
   same corpus completes: byte-identical clusters collapse to one
   representative before banding, members re-attach as LINEAR
   rep->member edges, and the pair count stays ~|corpus|, not
   ~|cluster|^2.

The corpus is synthesized deterministically IN-PLAN (spark.range +
xxhash64-derived tokens — no files, no RNG):

* 200k singleton "tail" docs with unique ~100-char texts;
* 3 hot exact-duplicate clusters of 30k copies each (the web reality:
  one boilerplate page at 10^3-10^6 copies) — 90k rows whose identical
  MinHash signatures share every band bucket;
* 500 near-dup variants (tail text + 4-char suffix, char-5-gram
  jaccard ~0.93) so the collapsed pipeline still has real near-dup
  work to find at rep level.

Quadratic counterfactual for scale framing: 3 clusters x C(30k,2)
~ 1.35e9 candidate pairs the rail refuses to build; the collapsed run
emits 89,997 linear member edges + ~500 near pairs instead.

Usage: python tools/scale_stress.py  (env: STRESS_TAIL, STRESS_COPIES,
STRESS_CPUS) — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

TAIL = int(os.environ.get("STRESS_TAIL", 200_000))
COPIES = int(os.environ.get("STRESS_COPIES", 30_000))
N_HOT = 3
N_VARIANTS = 500


def _text_of(idcol):
    """Deterministic ~100-char pseudo-text for a numeric id: 12 base-36
    tokens derived from xxhash64(id, position). Pure codegen."""
    return F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(11)),
                         lambda j: F.conv(
                             (F.abs(F.xxhash64(idcol, j)) % 99999999)
                             .cast("string"), 10, 36)))


def build_corpus(spark):
    tail = spark.range(TAIL).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("doc_id"),
        _text_of(F.col("id")).alias("text"))
    hot = spark.range(N_HOT * COPIES).select(
        F.lpad((F.col("id") + 10_000_000).cast("string"), 8, "0")
         .alias("doc_id"),
        _text_of((F.col("id") / COPIES).cast("long") + 1_000_000_000)
         .alias("text"))
    variants = spark.range(N_VARIANTS).select(
        F.lpad((F.col("id") + 20_000_000).cast("string"), 8, "0")
         .alias("doc_id"),
        F.concat(_text_of(F.col("id")), F.lit(" zzq")).alias("text"))
    return tail.unionByName(hot).unionByName(variants)


def main() -> int:
    from valico_spark.operators.dedup import minhash_dedup
    from valico_spark.session import get_spark

    cpus = os.environ.get("STRESS_CPUS", "8")
    spark = get_spark("scale_stress", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark)
    n_docs = N_HOT * COPIES + TAIL + N_VARIANTS

    out: dict = {"docs": n_docs, "hot_clusters": N_HOT,
                 "copies_per_cluster": COPIES,
                 "quadratic_counterfactual_pairs":
                     N_HOT * COPIES * (COPIES - 1) // 2}

    # A: raw banding — the rail must refuse the hot buckets.
    t0 = time.monotonic()
    try:
        minhash_dedup(corpus, jaccard_threshold=0.8,
                      precollapse_exact=False).count()
        out["guard"] = {"fired": False}
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        out["guard"] = {"fired": "max_group_size" in msg,
                        "sec_to_abort": round(time.monotonic() - t0, 2),
                        "message_head": msg[msg.find("minhash"):][:120]
                        if "max_group_size" in msg else msg[:200]}

    # B: the 100-TB posture — pre-collapse, then band representatives.
    t0 = time.monotonic()
    pairs = minhash_dedup(corpus, jaccard_threshold=0.8,
                          precollapse_exact=True)
    agg = pairs.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum((F.col("jaccard") == 1.0).cast("long")).alias("member"),
        F.sum((F.col("jaccard") < 1.0).cast("long")).alias("near"),
    ).collect()[0]
    sec = round(time.monotonic() - t0, 2)
    out["precollapsed"] = {
        "sec": sec, "docs_per_sec": round(n_docs / sec, 1),
        "pairs_total": agg["pairs"], "member_edges": agg["member"],
        "near_pairs": agg["near"],
        "expected_member_edges": N_HOT * (COPIES - 1)}
    spark.stop()
    print(json.dumps(out), flush=True)
    ok = (out["guard"].get("fired") is True
          and agg["member"] == N_HOT * (COPIES - 1)
          and agg["near"] >= int(N_VARIANTS * 0.95))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
