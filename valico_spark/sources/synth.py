"""Deterministic synthetic generator for the engine's primary input table.

Shape from BASELINE.json ``input_hint``:
``doc_id: string, spans: array<struct<kind:string, text:string,
media_ref:string, offset:int>>`` — interleaved text+media documents — plus
the ``media_assets`` referential-integrity target (FIXTURES.md §1-2).

Seeded, fully vectorized (numpy → pyarrow ListArray built directly from
offsets, no Python row loops), with deliberate defect fractions so expected
verdicts are computable:

* hot ``doc_id`` prefixes (skew stressor, north_rule) — prefix ``p00``
  owns ~30% of documents;
* zipf-distributed span counts with a 0.1% tail of oversized arrays;
* seeded violations: wrong enum kind, missing kind, negative offset,
  non-increasing offsets (span-order invariant breaker), dangling
  media_ref (~1%), duplicate doc_id (~0.1%), null text in a text span.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KINDS = np.array(["text", "image", "audio", "ref"])
KIND_P = np.array([0.70, 0.15, 0.10, 0.05])

SPANS_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

_WORDS = np.array([
    "data", "spark", "schema", "valid", "span", "doc", "stream", "check",
    "table", "rule", "batch", "arrow", "col", "shuffle", "étoile", "naïve",
    "𝒜𝓁𝓅𝒽𝒶", "日本語", "emoji😀", "Ω",
])


def generate_docs(n_docs: int, seed: int = 42,
                  defect_frac: float = 0.04,
                  dangling_frac: float = 0.01,
                  dup_frac: float = 0.001,
                  n_media: int = 100_000) -> pa.Table:
    rng = np.random.default_rng(seed)

    # doc ids with hot-prefix skew
    prefix = np.where(rng.random(n_docs) < 0.30, 0,
                      rng.integers(1, 16, n_docs))
    seq = np.arange(n_docs, dtype=np.int64)
    doc_id = np.char.add(
        np.char.add("p", np.char.zfill(prefix.astype("U2"), 2)),
        np.char.add("-", np.char.zfill(seq.astype("U10"), 10)))
    # ~0.1% duplicated doc ids (uniqueness-check stressor)
    n_dup = max(0, int(n_docs * dup_frac))
    if n_dup:
        tgt = rng.choice(n_docs, n_dup, replace=False)
        src = rng.integers(0, n_docs, n_dup)
        doc_id[tgt] = doc_id[src]

    # span counts: zipf tail, clipped; 0.1% oversized arrays
    counts = np.minimum(rng.zipf(1.8, n_docs), 40).astype(np.int32)
    oversized = rng.random(n_docs) < 0.001
    counts[oversized] = 400
    # a small fraction of empty span arrays (minItems violation)
    empty = rng.random(n_docs) < defect_frac * 0.2
    counts[empty] = 0

    total = int(counts.sum())
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    # flat span attributes
    kind_idx = rng.choice(len(KINDS), total, p=KIND_P)
    kind = KINDS[kind_idx].astype(object)
    is_text = kind_idx == 0

    words = rng.choice(_WORDS, total)
    text = np.where(is_text, words, None)

    media_num = rng.integers(0, n_media, total)
    dangling = rng.random(total) < dangling_frac
    media_num[dangling] = n_media + rng.integers(0, 1000, int(dangling.sum()))
    media_ref = np.where(
        ~is_text,
        np.char.add("m", np.char.zfill(media_num.astype("U9"), 8)).astype(object),
        None)

    # offsets strictly increasing within each doc: global cumsum of steps
    # minus each doc's starting base
    step = rng.integers(1, 50, total).astype(np.int64)
    cum = np.cumsum(step)
    doc_start = offsets[:-1]
    base = np.where(doc_start == 0, 0, cum[doc_start - 1])
    span_offset = (cum - np.repeat(base, counts)).astype(np.int64)

    # ---- seeded defects (deterministic fractions) ----
    defective = rng.random(n_docs) < defect_frac
    d_rows = np.nonzero(defective & (counts > 0))[0]
    if len(d_rows):
        first = offsets[d_rows]  # first span of each defective doc
        mode = rng.integers(0, 4, len(d_rows))
        # 0: wrong enum kind
        kind[first[mode == 0]] = "video"
        # 1: missing kind (null)
        kind[first[mode == 1]] = None
        # 2: negative offset
        span_offset[first[mode == 2]] = -5
        # 3: break strict ordering (second span <= first)
        two = d_rows[(mode == 3) & (counts[d_rows] >= 2)]
        span_offset[offsets[two] + 1] = span_offset[offsets[two]]

    struct = pa.StructArray.from_arrays(
        [pa.array(kind, pa.string()),
         pa.array(text, pa.string()),
         pa.array(media_ref, pa.string()),
         pa.array(span_offset.astype(np.int32), pa.int32())],
        ["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    return pa.table({"doc_id": pa.array(doc_id.astype(object), pa.string()),
                     "spans": spans})


def generate_media_assets(n_media: int = 100_000, seed: int = 43,
                          defect_frac: float = 0.02) -> pa.Table:
    rng = np.random.default_rng(seed)
    media_ref = np.char.add(
        "m", np.char.zfill(np.arange(n_media).astype("U9"), 8))
    media_type = np.where(rng.random(n_media) < 0.6, "image", "audio"
                          ).astype(object)
    size_bytes = rng.integers(100, 10_000_000, n_media)
    checksum = np.array(
        ["%064x" % x for x in
         rng.integers(0, 2**62, n_media, dtype=np.int64)], dtype=object)

    bad = rng.random(n_media) < defect_frac
    idx = np.nonzero(bad)[0]
    third = max(1, len(idx) // 3)
    media_type[idx[:third]] = "video"          # enum violation
    size_bytes[idx[third:2 * third]] = -1      # minimum violation
    checksum[idx[2 * third:]] = "not-a-sha"    # pattern violation

    return pa.table({
        "media_ref": pa.array(media_ref.astype(object), pa.string()),
        "media_type": pa.array(media_type, pa.string()),
        "size_bytes": pa.array(size_bytes, pa.int64()),
        "checksum": pa.array(checksum, pa.string()),
    })


def write_fixture(out_dir: str, n_docs: int = 20_000,
                  n_media: int = 20_000, seed: int = 42) -> None:
    """Materialize docs + media_assets parquet under ``out_dir``."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    # small row groups so local runs get scan-side parallelism, like the
    # many-split layout a real table has at scale
    pq.write_table(generate_docs(n_docs, seed=seed, n_media=n_media),
                   f"{out_dir}/docs.parquet", row_group_size=10_000)
    pq.write_table(generate_media_assets(n_media, seed=seed + 1),
                   f"{out_dir}/media_assets.parquet", row_group_size=10_000)
    # zero-row table with the identical schema: used by the bench to
    # measure pure plan-construction/optimization overhead
    pq.write_table(generate_docs(2, seed=seed).slice(0, 0),
                   f"{out_dir}/docs_empty.parquet")
