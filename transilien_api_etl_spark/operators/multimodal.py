"""Multimodal column plumbing (SURVEY.md §3 F11; BASELINE.json mandate).

Contract: media travel as opaque ``binary`` payloads + a typed metadata
struct (mime, n_bytes, media-specific fields). Decode / feature-extraction
runs as Arrow-batched ``mapInPandas`` — the per-batch shape (iterator of
pandas DataFrames) is exactly what an image/audio library consumes.

The image/audio libs are NOT in this container, so the actual decoders are
STUBBED: ``decode_features`` computes deterministic fake features from the
payload bytes (so tests are stable), and ``decode_image`` raises
NotImplementedError behind an import-try on PIL. The Spark-side plumbing —
schema, batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, checksum long"
)


def attach_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Wrap a source column as (payload binary, meta struct) — the ingest
    normalization every modality goes through (binaryFile source lands the
    same shape: path/length/content)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).

    STUB decoder: fake width/height derived deterministically from payload
    length, checksum = sum of byte values. Swap `_features_of` for a real
    decoder (PIL/librosa/av) when the libs exist; the plumbing is identical.
    """

    def _features_of(payload: bytes) -> tuple[int, int, int]:
        n = len(payload)
        return (n % 640 + 1, n % 480 + 1, sum(payload) % (1 << 31))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_features_of)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]).astype("int64"),
                    "width": feats.map(lambda t: t[0]).astype("int32"),
                    "height": feats.map(lambda t: t[1]).astype("int32"),
                    "checksum": feats.map(lambda t: t[2]).astype("int64"),
                }
            )

    return df.select(id_col, "payload", "meta").mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — gated on PIL availability (not in this container)."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires Pillow; container ships without it — "
            "use decode_features (deterministic stub) for plumbing tests"
        ) from e
    raise NotImplementedError("wire PIL.Image.open over mapInPandas batches here")


RESIZED_SCHEMA = (
    "doc_id long, payload binary, mime string, n_bytes long, width int, height int"
)


def resize_payloads(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing over mapInPandas (STUB transform).

    A real resize maps decoded pixels → pixels; the stub maps the byte
    buffer to exactly width×height bytes (truncate / cycle-pad), preserving
    determinism so the batch shape, schema evolution, and partitioning can
    be tested. Swap the inner lambda for PIL's ``Image.resize`` when
    available — the Spark plumbing does not change.
    """
    target = width * height

    def _resize(payload: bytes) -> bytes:
        if len(payload) >= target:
            return bytes(payload[:target])
        reps = (target + len(payload) - 1) // len(payload) if payload else 1
        return bytes((payload * reps)[:target]) if payload else bytes(target)

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": resized,
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": resized.map(len).astype("int64"),
                    "width": width,
                    "height": height,
                }
            )

    out = df.select(id_col, "payload", "meta").mapInPandas(transform, RESIZED_SCHEMA)
    return out.withColumn("width", F.col("width").cast("int")).withColumn(
        "height", F.col("height").cast("int")
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes long"


def sample_frames(
    df: DataFrame, frame_size: int = 256, every_n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling plumbing (video-shaped payloads), one output row per
    sampled frame — the row-exploding mapInPandas shape a real demuxer
    (PyAV) plugs into. STUB: frames are fixed-size byte slices; every
    ``every_n``-th is kept.
    """

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    frame = bytes(payload[i * frame_size : (i + 1) * frame_size])
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame": frame,
                            "frame_bytes": len(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame", "frame_bytes"])

    return df.select(id_col, "payload").mapInPandas(explode_frames, FRAME_SCHEMA)
