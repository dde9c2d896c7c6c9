"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video bytes ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode step is CAPABILITY-GATED: when Pillow
imports, ``decode_image_features``/``resize_media`` run a real
decode+pool/resample; otherwise they raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (byte-statistics
features) exercises the identical Spark plumbing — schema, batching,
partitioning — end to end. This container has no imaging libs, so the real
branch is covered by an ``importorskip`` test that activates wherever
Pillow exists.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pillow():
    """Capability probe: the ``PIL.Image`` module, or None if Pillow is not
    importable in the executor environment."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, payload_md5 string, "
    "byte_mean double, feature array<float>"
)


def synth_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents fixture: the text
    bytes ARE the payload. Schema-faithful stand-in for real decoded media."""
    return documents.select(
        F.concat(F.lit(f"{kind}-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.length("text") % 640).cast("int").alias("width"),
            (F.length("text") % 480).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n_dims: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded feature vector."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:n_dims]]


def decode_image_features(
    media: DataFrame, n_dims: int = 8, fake: bool = False
) -> DataFrame:
    """Decode payloads → fixed-size feature vectors via ``mapInPandas``.

    Real path (when Pillow imports): decode the image, grayscale it, and
    mean-pool pixels into an ``n_dims``-wide vector. Fake path
    (``fake=True``): deterministic md5-seeded features. Both ride the same
    Spark plumbing (Arrow batches, schema, partition parallelism); the
    capability probe runs lazily INSIDE the UDF so it reflects the executor
    environment, not the driver's.
    """
    if not fake and _pillow() is None:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not importable "
            "here; pass fake=True for the deterministic stand-in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fake:
            decode = lambda b: _fake_decode(b, n_dims)  # noqa: E731
        else:
            import io  # noqa: PLC0415

            Image = _pillow()
            if Image is None:  # executor env differs from driver
                raise NotImplementedError("Pillow missing on executor")

            def decode(b: bytes) -> list[float] | None:
                # grayscale → resize to an n_dims strip == mean-pooled bins.
                # Undecodable/empty payloads yield NULL features instead of
                # failing the task: one corrupt image in a harvested corpus
                # must not abort the whole decode job (the md5/byte-stats
                # columns still identify the bad row for lineage).
                try:
                    img = Image.open(io.BytesIO(b)).convert("L")
                    strip = img.resize((n_dims, 1))
                    return [px / 255.0 for px in strip.getdata()]
                except Exception:
                    return None

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "byte_mean": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ),
                    "feature": payloads.map(lambda b: decode(bytes(b))),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, kind string, n_bytes long, resized_hex string"
)


def resize_media(
    media: DataFrame, target_bytes: int = 64, fake: bool = False
) -> DataFrame:
    """Resize payloads to a fixed byte budget via ``mapInPandas``.

    Real path (when Pillow imports): decode + bilinear-resample the image
    to a square grid of ~``target_bytes`` grayscale pixels. Fake path
    (``fake=True``): nearest-neighbor BYTE resampling
    (``out[j] = payload[j*len//target]``) — identical Spark plumbing
    (Arrow batches, binary in / fixed-size out, schema change) and, being
    pure index arithmetic, byte-checkable against a SQL oracle
    (``multimodal_resize``). Resampled bytes are emitted hex-encoded so
    downstream comparison needs no binary canonicalization.
    """
    if not fake and _pillow() is None:
        raise NotImplementedError(
            "real image resize requires Pillow, which is not importable "
            "here; pass fake=True for the deterministic stand-in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fake:
            def resample(b) -> str:
                b = bytes(b)
                if not b:
                    return ""
                n = len(b)
                return bytes(
                    b[(j * n) // target_bytes] for j in range(target_bytes)
                ).hex()
        else:
            import io  # noqa: PLC0415

            Image = _pillow()
            if Image is None:
                raise NotImplementedError("Pillow missing on executor")
            side = max(1, int(target_bytes**0.5))

            def resample(b) -> str | None:
                b = bytes(b)
                if not b:
                    return ""
                # corrupt payload → NULL, not a task failure (see decode)
                try:
                    img = Image.open(io.BytesIO(b)).convert("L")
                    small = img.resize((side, side), Image.BILINEAR)
                    return bytes(small.getdata()).hex()
                except Exception:
                    return None

        for pdf in it:
            resized = pdf["payload"].map(resample)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # actual emitted byte count (== target for the fake
                    # path, side² for the real path), not the requested
                    # one; nullable Int64 — a corrupt real-path payload
                    # yields NULL resample and NULL count
                    "n_bytes": (resized.str.len() // 2).astype("Int64"),
                    "resized_hex": resized,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def media_chunks(media: DataFrame, chunk_bytes: int = 100) -> DataFrame:
    """Fixed-size window slicing over media payloads (the audio analogue of
    :func:`frame_sample`): ``(media_id, chunk_idx, start_byte, end_byte)``.

    Pure column expressions — the plan shape (explode over a computed
    window count) is what partitions a 100-TB audio corpus into
    independently processable segments; the per-chunk decode would slot
    into the same ``mapInPandas`` stage as the feature extractor.
    """
    n = F.length("payload")
    n_chunks = F.ceil(n / F.lit(chunk_bytes)).cast("int")
    return (
        media.select(
            "media_id",
            n.alias("_n"),
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
            ).alias("chunk_idx"),
        )
        .filter(F.col("_n") > 0)
        .select(
            "media_id",
            F.col("chunk_idx").cast("long"),
            (F.col("chunk_idx") * chunk_bytes).cast("long").alias("start_byte"),
            F.least(
                (F.col("chunk_idx") + 1) * chunk_bytes, F.col("_n")
            ).cast("long").alias("end_byte"),
        )
    )


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video-kind rows: emit (media_id, frame_idx) rows.

    Pure column ops — the per-frame payload slicing would live in the
    decode UDF; here the *plan shape* (explode by frame index) is what
    matters for partitioning."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_nth)
            )
        ).alias("frame_idx"),
    )
