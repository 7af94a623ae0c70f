"""Multimodal column handling for large-scale training-data pipelines:
image/audio/video as opaque ``binary`` columns + typed metadata structs,
with decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages.

The actual codec calls (PIL/libav/ffmpeg) are NOT available in this
environment, so the decode kernel is STUBBED two ways, both behind the
same Spark plumbing (schema, partitioning, UDF signature, batch shape —
all real and tested in tests/test_multimodal.py):

  * ``decode_strict``   — raises NotImplementedError (production stub:
    swap in the real codec per modality)
  * ``decode_fake``     — deterministic synthetic decode (header parse +
    content-hash-seeded feature vector), so the distributed pipeline is
    end-to-end testable today

Design notes for 100 TB of media:
- blobs stay in the executor: every stage is mapInPandas (Arrow transfer,
  no driver collect); metadata-only queries never touch the binary column
  (parquet column pruning — verified via ReadSchema in the plan test)
- one row per asset; frame sampling emits (asset_id, frame_no) rows via
  the iterator UDF so a long video never materializes as one giant batch
- feature vectors are fixed-width array<float> — the layout the ANN
  operators (operators/corpus.q_embedding_*) consume directly
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_DIM = 16

META_SCHEMA = (
    "asset_id long, modality string, n_bytes long, content_hash string, "
    "magic string"
)

FEATURES_SCHEMA = f"asset_id long, features array<float>"

FRAMES_SCHEMA = "asset_id long, frame_no int, frame_hash string"

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x1aE\xdf\xa3": "video/webm",
}


def sniff_modality(payload: bytes) -> str:
    """Header sniffing — pure bytes, no codec needed."""
    if payload is None:
        return "unknown"
    for magic, mime in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def decode_strict(payload: bytes) -> np.ndarray:
    """Production decode stub: swap in the real per-modality codec
    (PIL.Image.open / soundfile / PyAV). Raises until then."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_fake for the deterministic test path"
    )


def decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: FEATURE_DIM floats in [-1, 1) seeded
    by the content hash. Same bytes -> same 'decoded' features on any
    executor — the property the pipeline tests rely on."""
    h = hashlib.md5(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**31 - 1.0).astype(np.float32)


def asset_metadata(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over the opaque blob — JVM-only expressions, the
    binary column is read but never shipped to Python."""
    return assets.select(
        "asset_id",
        F.col("modality"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_hash"),
        F.base64(F.substring(F.col(payload_col), 1, 4)).alias("magic_b64"),
    )


def extract_features(
    assets: DataFrame, payload_col: str = "payload", strict: bool = False
) -> DataFrame:
    """blob -> fixed-width feature vector via iterator mapInPandas (the
    image-embedding / audio-fingerprint stage shape)."""
    decode = decode_strict if strict else decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(), "features": feats}
            )

    return assets.select("asset_id", payload_col).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(
    assets: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling shape: 1 asset row -> N (frame_no, frame_hash) rows.
    The stub 'frame' is a byte-window hash; a real video decoder plugs in
    at the same spot with the same fan-out contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, hashes = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf[payload_col]):
                payload = payload or b""
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(aid)
                    frames.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": frames, "frame_hash": hashes}
            )

    return assets.select("asset_id", payload_col).mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def make_assets(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic asset table (binary payloads with real
    magic headers) — counter-based like sources/pages.py."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magics = list(_MAGIC.keys())
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            modalities = []
            for i in ids:
                magic = magics[int(i) % len(magics)]
                body = hashlib.md5(f"asset-{i}".encode()).digest() * (
                    3 + int(i) % 5
                )
                payloads.append(magic + body)
                modalities.append(sniff_modality(magic + body))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": modalities,
                    "payload": payloads,
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, schema="asset_id long, modality string, payload binary"
    )
