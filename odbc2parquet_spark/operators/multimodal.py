"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded via Arrow-batched Pandas UDFs.

The pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column next to typed metadata; decode/feature-extract runs as
``mapInPandas`` so each task processes Arrow record batches (no per-row
Python), and partitioning/pushdown operate on the metadata columns only —
the binary column is never read unless selected.

This container ships no codec libraries, so the codec call itself is
STUBBED: ``decode_features`` tries the real decoder import (PIL) and falls
back to a deterministic fake derived from the byte stream. The Spark-side
plumbing — schema, batch iteration, UDF signature, column pruning — is the
real thing and is what the tests/oracle verify.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the decoder — what a real image decode would produce.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, "
    "fake_channels int, checksum long"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload as opaque binary + metadata.

    On real data this is the ingestion shape: (id, payload binary,
    mime string, n_bytes long).
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _decode_real(payload: bytes) -> tuple[int, int, int]:
    """The real decoder hook. Raises if no codec library is present."""
    try:
        from PIL import Image  # noqa: F401  (not installed in this container)
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "no codec library in this environment; using deterministic fake"
        ) from exc
    raise NotImplementedError("real decode path not exercised in tests")


def _decode_fake(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in: 'dimensions' derived from the byte stream.

    Pure arithmetic on length and byte sum, so the oracle can verify the
    full mapInPandas plumbing end-to-end without a codec.
    """
    n = len(payload)
    checksum = sum(payload) % 1_000_000_007
    return n % 640 + 1, (n * 7) % 480 + 1, 3, checksum


def decode_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, feature columns out.

    Column pruning matters: the plan reads only (doc_id, payload); metadata
    columns not consumed by the UDF are dropped before the Python boundary.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, c = _decode_real(payload)
                    checksum = -1
                except NotImplementedError:
                    w, h, c, checksum = _decode_fake(payload)
                rows.append((doc_id, len(payload), w, h, c, checksum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "fake_width",
                    "fake_height",
                    "fake_channels",
                    "checksum",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(decode_batches, FEATURE_SCHEMA)


def frame_sample(binary_df: DataFrame, every_n_bytes: int = 97) -> DataFrame:
    """'Frame sampling' stub: pick every Nth byte as a frame marker.

    Stands in for video frame extraction; shows the explode-to-frames
    shape (one row per sampled frame) with deterministic content.
    """
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an empty
    # array — payloads shorter than the stride must short-circuit.
    frames = F.expr(
        f"CASE WHEN n_bytes < {every_n_bytes} THEN array() ELSE "
        f"transform(sequence(1, int(n_bytes div {every_n_bytes})), "
        f"i -> struct(CAST(i AS BIGINT) AS frame_no, "
        f"ascii(substring(decode(payload, 'utf-8'), (i - 1) * {every_n_bytes} + 1, 1)) AS byte_val)) END"
    )
    return binary_df.select("doc_id", F.explode(frames).alias("f")).select(
        "doc_id", F.col("f.frame_no").alias("frame_no"), F.col("f.byte_val").alias("byte_val")
    )


#: resize output: metadata + the resized payload itself (binary travels on)
RESIZE_SCHEMA = (
    "doc_id long, out_width int, out_height int, out_n_bytes long, "
    "out_checksum long, resized binary"
)


def _resize_fake(payload: bytes, target: int) -> bytes:
    """Deterministic stand-in for pixel resampling: cycle the byte stream
    to the target buffer size (floor-cycles + prefix)."""
    if not payload:
        return b"\x00" * target
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(
    binary_df: DataFrame, target_w: int = 16, target_h: int = 12, channels: int = 3
) -> DataFrame:
    """'Resize' each binary payload to a fixed target_w x target_h buffer.

    Real pipeline shape: mapInPandas over (id, payload) with the resized
    payload returned as a binary column (so downstream stages keep
    operating on columnar binary) plus verifiable metadata. The pixel
    resample itself is stubbed (no codec libs here): tries PIL, falls back
    to deterministic byte-cycling the oracle can recompute.
    """
    target = target_w * target_h * channels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                try:
                    _decode_real(payload)  # raises NotImplementedError here
                    raise AssertionError("real resize path unreachable in tests")
                except NotImplementedError:
                    resized = _resize_fake(payload, target)
                checksum = sum(resized) % 1_000_000_007
                rows.append(
                    (doc_id, target_w, target_h, target, checksum, bytearray(resized))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "out_width",
                    "out_height",
                    "out_n_bytes",
                    "out_checksum",
                    "resized",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


EMBED_SCHEMA = "doc_id long, embedding array<double>"


def embed_payloads(binary_df: DataFrame, dim: int = 8) -> DataFrame:
    """Binary payload -> embedding vector (the encoder step that links the
    multimodal store to the similarity stack: decode -> embed -> ANN).

    The real encoder (CLIP-style model inference) needs libs absent here,
    so the embedding is a deterministic md5 projection of the bytes —
    component j = md5(payload || ':' || j)[:6] / 2^24, rounded to 6
    decimals — which exercises the REAL plumbing: Arrow-batched
    mapInPandas, column pruning to (doc_id, payload), array<double>
    output column ready for operators/similarity.
    """
    import hashlib

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                vec = [
                    round(
                        int(hashlib.md5(payload + b":" + str(j).encode()).hexdigest()[:6], 16)
                        / 16777216.0,
                        6,
                    )
                    for j in range(dim)
                ]
                rows.append((doc_id, vec))
            yield pd.DataFrame(rows, columns=["doc_id", "embedding"])

    return binary_df.select("doc_id", "payload").mapInPandas(embed_batches, EMBED_SCHEMA)
