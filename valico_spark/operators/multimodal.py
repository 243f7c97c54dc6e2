"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the layout a 100 TB interleaved corpus uses. The Spark-side machinery
(schema, partition-aware batching, Arrow UDF signatures, size accounting)
is real and tested; the *codec* step is stubbed: the sandbox has no
image/audio libraries, so decode is a deterministic fake behind an
import-try (clearly marked), and byte-level feature extraction
(histograms, entropy, magic-number sniffing) is real vectorized work.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
    b"FAKE": "application/x-fake",
}


def sniff_media_type(payload: F.Column) -> F.Column:
    """Magic-number sniffing on the binary column — pure JVM expression."""
    head = F.substring(payload, 1, 4)
    expr = F.lit(None).cast("string")
    for magic, mime in reversed(_MAGIC.items()):
        expr = F.when(
            F.substring(payload, 1, len(magic)) == F.lit(magic), mime
        ).otherwise(expr)
    return expr


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Byte-level stats without leaving the JVM: size, sniffed type."""
    return df.withColumns({
        "payload_bytes": F.length(F.col(payload_col)),
        "sniffed_type": sniff_media_type(F.col(payload_col)),
    })


def byte_histogram_features(df: DataFrame, payload_col: str = "payload",
                            id_col: str = "media_ref",
                            bins: int = 16) -> DataFrame:
    """Arrow-native feature extraction: 16-bin byte histogram + entropy
    per payload, with NO per-row Python. ``mapInArrow`` exposes the
    binary column's flattened (offsets, data) buffers; the whole batch is
    one numpy segment computation — bincount over
    ``segment_id * bins + nibble`` then a reshaped vectorized entropy."""
    import numpy as np
    import pyarrow as pa

    out_schema = (f"{id_col} string, n_bytes long, entropy double, "
                  f"histogram array<double>")

    def extract(batches: Iterator["pa.RecordBatch"]
                ) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc
        for batch in batches:
            ids = batch.column(0)
            col = batch.column(1)
            n = len(col)
            # NULL payloads become empty segments (0 bytes, entropy 0)
            col = pc.fill_null(col.cast(pa.large_binary()), b"")
            offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
                col.offset: col.offset + n + 1]
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            lens = np.diff(offs)
            seg = np.repeat(np.arange(n, dtype=np.int64), lens)
            buf = data[offs[0]: offs[-1]]
            seg_bins = seg * bins + (buf >> 4)
            hist = np.bincount(seg_bins, minlength=n * bins) \
                     .reshape(n, bins).astype(np.float64)
            tot = np.maximum(hist.sum(axis=1, keepdims=True), 1.0)
            p = hist / tot
            logs = np.zeros_like(p)
            np.log2(p, out=logs, where=p > 0)
            ent = -(p * logs).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(lens, pa.int64()), pa.array(ent),
                 pa.FixedSizeListArray.from_arrays(
                     pa.array((p * bins).ravel()), bins).cast(
                     pa.list_(pa.float64()))],
                names=[id_col, "n_bytes", "entropy", "histogram"])

    return df.select(id_col, payload_col).mapInArrow(extract, out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_ref",
                 target_size: tuple[int, int] = (64, 64),
                 codec: str = "auto") -> DataFrame:
    """Decode + resize stage (grayscale tensor per payload).

    ``codec="auto"`` uses Pillow when importable (real decode: open,
    convert to L, resize to ``target_size``, normalize to [0,1]);
    payloads Pillow cannot parse fall back to the deterministic fake
    tensor (tiled payload bytes), tagged by the ``decoder`` column.
    ``codec="fake"`` forces the deterministic fake on every row — the
    mode driver queries use so the output is oracle-exact regardless of
    what is installed.  The Spark-side plumbing (Arrow batches, offsets
    math, schema, partitioning) is identical in both modes.
    """
    if codec not in ("auto", "fake"):
        raise ValueError(f"unknown codec mode {codec!r}")
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, width int, height int, "
                  f"pixels array<float>, decoder string")
    tw, th = target_size
    npix = tw * th

    def decode(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        have_pil = False
        if codec == "auto":
            try:  # pragma: no cover - Pillow absent in this sandbox
                from PIL import Image
                have_pil = True
            except ImportError:
                have_pil = False

        def pil_decode(buf):  # pragma: no cover - needs Pillow
            import io
            try:
                with Image.open(io.BytesIO(buf)) as im:
                    im = im.convert("L").resize((tw, th))
                    return (np.asarray(im, dtype=np.float32)
                            / np.float32(255.0)).ravel()
            except Exception:  # undecodable -> deterministic fake
                return None

        for batch in batches:
            # parquet scans can hand over dictionary-encoded columns;
            # Spark's Arrow reader rejects a dictionary column in the
            # OUTPUT batch, so decode ids on the way in (type unchanged)
            ids = batch.column(0)
            if pa.types.is_dictionary(ids.type):
                ids = ids.dictionary_decode()
            col = batch.column(1)
            n = len(col)
            null_mask = np.asarray(col.is_null())
            col = pc.fill_null(col.cast(pa.large_binary()), b"")
            offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
                col.offset: col.offset + n + 1]
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            lens = np.diff(offs)
            nonnull = ~null_mask
            has_pix = lens > 0  # null payloads were filled to b"" above
            if have_pil:  # pragma: no cover - needs Pillow
                # real codec: inherently per-image, but Arrow-batched
                # around it; undecodable payloads keep the fake tensor
                pix_rows, decoders = [], []
                for i in range(n):
                    if null_mask[i]:
                        pix_rows.append([])
                        decoders.append("null")
                        continue
                    buf = bytes(data[offs[i]:offs[i + 1]])
                    decoded = pil_decode(buf) if buf else None
                    if decoded is not None:
                        pix_rows.append(decoded)
                        decoders.append("pil")
                    elif buf:
                        tiled = np.frombuffer(buf, np.uint8)[
                            np.arange(npix) % len(buf)]
                        pix_rows.append(tiled.astype(np.float32)
                                        / np.float32(255.0))
                        decoders.append("fake-v1")
                    else:
                        pix_rows.append([])
                        decoders.append("fake-v1")
                yield pa.RecordBatch.from_arrays(
                    [ids,
                     pa.array(np.where(nonnull, tw, 0).astype(np.int32)),
                     pa.array(np.where(nonnull, th, 0).astype(np.int32)),
                     pa.array(pix_rows, pa.list_(pa.float32())),
                     pa.array(decoders)],
                    names=[id_col, "width", "height", "pixels", "decoder"])
                continue
            # deterministic fake, whole batch in one fancy-index: row i's
            # pixel j is payload byte (j mod len_i) — the same tiling the
            # old per-row loop produced, with zero Python per row
            with_bytes = np.nonzero(has_pix)[0]
            idx = (offs[with_bytes, None]
                   + (np.arange(npix, dtype=np.int64)[None, :]
                      % lens[with_bytes, None]))
            flat = (data[idx].astype(np.float32)
                    / np.float32(255.0)).ravel()
            # null/empty payloads -> empty pixel list via per-row offsets
            row_npix = np.where(has_pix, npix, 0).astype(np.int32)
            pix_offsets = np.concatenate(
                [np.zeros(1, np.int32), np.cumsum(row_npix, dtype=np.int32)])
            pixels = pa.ListArray.from_arrays(
                pa.array(pix_offsets), pa.array(flat, pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [ids,
                 pa.array(np.where(nonnull, tw, 0).astype(np.int32)),
                 pa.array(np.where(nonnull, th, 0).astype(np.int32)),
                 pixels,
                 pc.if_else(pa.array(nonnull), "fake-v1", "null")],
                names=[id_col, "width", "height", "pixels", "decoder"])

    return df.select(id_col, payload_col).mapInArrow(decode, out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_ref", frame_bytes: int = 1024,
                  every_k: int = 4, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video-like payloads: treat the binary payload
    as a sequence of fixed-size ``frame_bytes`` records and emit every
    ``every_k``-th frame (up to ``max_frames``) as its own row.

    REAL plumbing, codec-free: a container demuxer would replace the
    fixed-size slicing, but the Spark-side shape is what matters at
    scale — one input row fans out to at most ``max_frames`` output
    rows (bounded amplification), the per-frame payloads are zero-copy
    slices of the batch's Arrow data buffer, and downstream stages see
    a (media_ref, frame_idx, frame) table they can decode/embed
    per-frame. Pure codegen fan-out (slice over a sequence), no Python
    in the row loop at all.
    """
    pay = F.col(payload_col)
    n_frames = F.floor(F.length(pay) / frame_bytes).cast("int")
    idx = F.sequence(
        F.lit(0),
        F.greatest(
            F.least(n_frames - 1, F.lit(every_k * (max_frames - 1))),
            F.lit(0)),
        F.lit(every_k))
    frames = F.when(
        n_frames > 0,
        F.transform(idx, lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(pay, i * frame_bytes + 1, frame_bytes)
             .alias("frame")))
    ).otherwise(F.array().cast(
        "array<struct<frame_idx:int,frame:binary>>"))
    return (df.select(id_col, F.explode(frames).alias("f"))
              .select(id_col, F.col("f.frame_idx").alias("frame_idx"),
                      F.col("f.frame").alias("frame")))


def generate_media_payloads(n: int, seed: int = 99):
    """Deterministic synthetic payload table (pyarrow) for tests: FAKE
    magic + pseudorandom bytes + metadata."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    refs = [f"m{i:08d}" for i in range(n)]
    sizes = rng.integers(64, 4096, n)
    payloads = [b"FAKE" + rng.integers(0, 256, s).astype(np.uint8).tobytes()
                for s in sizes]
    kinds = rng.choice(["image", "audio"], n)
    meta = [{"width": int(rng.integers(8, 512)),
             "height": int(rng.integers(8, 512)),
             "duration_ms": int(rng.integers(0, 60000)),
             "codec": "fake"} for _ in range(n)]
    return pa.table({
        "media_ref": pa.array(refs),
        "media_type": pa.array(kinds.tolist()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(meta, pa.struct([
            ("width", pa.int32()), ("height", pa.int32()),
            ("duration_ms", pa.int32()), ("codec", pa.string())])),
    })
