"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container): `decode_image(..., fake=True)` produces a deterministic fake
decode from the payload bytes so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and tested; with
fake=False it raises NotImplementedError where a real codec
(PIL/torchaudio/ffmpeg) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload + typed metadata: the canonical multimodal row layout
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text table as a multimodal table: payload = UTF-8 bytes of
    the text (stand-in for real media bytes), media_meta typed struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: 'dimensions' from the first payload
    bytes, an 8-dim byte-histogram feature vector. Stands in for
    PIL.Image.open / resize / embed — identical batch shape and dtypes."""
    payloads = pdf["payload"]
    widths, heights, nbytes, feats = [], [], [], []
    for b in payloads:
        b = bytes(b) if b is not None else b""
        n = len(b)
        widths.append((b[0] if n else 0) + 1)
        heights.append((b[1] if n > 1 else 0) + 1)
        nbytes.append(n)
        hist = [0.0] * 8
        for byte in b:
            hist[byte & 7] += 1.0
        total = sum(hist) or 1.0
        feats.append([h / total for h in hist])
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": pd.Series(widths, dtype="int32"),
            "height": pd.Series(heights, dtype="int32"),
            "n_bytes": pd.Series(nbytes, dtype="int64"),
            "feature": feats,
        }
    )


def decode_image(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode/feature-extract a binary media column via mapInPandas
    (Arrow batches; one pandas frame per partition chunk — never per-row
    Python). Partitioning is preserved; at scale run after a
    repartition sized so each task's payload batch fits executor memory."""
    if not fake:
        def _real(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real media decode requires an image/audio codec library "
                "(PIL / torchaudio / ffmpeg) not present in this environment"
            )

        return media.mapInPandas(_real, DECODED_SCHEMA)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(_gen, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("pts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_image(
    media: DataFrame, width: int, height: int, *, fake: bool = True
) -> DataFrame:
    """Resize plumbing via mapInPandas: same batch shape a PIL
    `Image.resize` pipeline would use. fake=True produces a deterministic
    stand-in (payload truncated/cycled to width*height bytes) so schema,
    batching and downstream joins are real; fake=False raises where the
    codec plugs in."""
    if not fake:
        def _real(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError("real resize requires an image codec (PIL)")

        return media.mapInPandas(_real, RESIZED_SCHEMA)

    target = width * height

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for b in pdf["payload"]:
                b = bytes(b) if b is not None else b""
                if not b:
                    b = b"\x00"
                reps = (target // len(b)) + 1
                out_payloads.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payloads,
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_gen, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    *,
    frame_bytes: int = 16,
    every_n: int = 2,
    fps_ms: int = 40,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling plumbing: one video payload row -> N frame rows
    (doc_id, frame_index, pts_ms, frame_payload), keeping every
    `every_n`-th frame — the mapInPandas row-expansion shape an ffmpeg
    frame extractor would use. fake=True chunks the payload bytes into
    deterministic pseudo-frames; fake=False raises where ffmpeg plugs in."""
    if frame_bytes <= 0 or every_n <= 0:
        # fail fast on the driver, not as an opaque ZeroDivisionError
        # inside a Python worker mid-job
        raise ValueError("frame_bytes and every_n must be positive")
    if not fake:
        def _real(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError("real frame sampling requires ffmpeg")

        return media.mapInPandas(_real, FRAME_SCHEMA)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, pts, frames = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                n_frames = max(len(b) // frame_bytes, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    pts.append(i * fps_ms)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    # nullable Int64, not int64: MEDIA_SCHEMA permits NULL
                    # doc_ids and a non-nullable numpy dtype would raise in
                    # the worker and abort the whole job on one such row
                    "doc_id": pd.Series(ids, dtype="Int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "pts_ms": pd.Series(pts, dtype="int64"),
                    "frame_payload": frames,
                }
            )

    return media.mapInPandas(_gen, FRAME_SCHEMA)
