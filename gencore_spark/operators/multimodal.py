"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design contract for image/audio/video columns at 100TB scale:

* payloads are opaque ``binary`` columns, never parsed JVM-side;
* per-item metadata is a typed struct column next to the payload;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so payload bytes stream through Python in batches
  (never row-at-a-time), and the output schema is declared up front.

The decode kernels themselves are STUBBED here (no image/audio libraries in
this container): ``decode_stub=True`` produces deterministic fake features
(seeded from the payload hash) with the real schema, partitioning, and batch
shape, so the Spark-side plumbing is fully exercised and tested; a real
deployment swaps ``_fake_features`` for a PIL/ffmpeg call with the same
signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, width int, height int, "
    "feature array<float>"
)

_FEATURE_DIM = 8


def _fake_features(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real decoder.

    Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))
        return img.width, img.height, embed(img)

    Here: dimensions and features derive from a seeded hash of the payload,
    so tests are reproducible and the plumbing (schema, batching) is real.
    """
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    rng = np.random.default_rng(int(h.sum()))
    w, ht = int(rng.integers(16, 2048)), int(rng.integers(16, 2048))
    feat = rng.standard_normal(_FEATURE_DIM).astype(np.float32)
    return w, ht, feat


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    modality: str = "image",
    decode_stub: bool = True,
) -> DataFrame:
    """binary payloads → typed feature rows via mapInPandas.

    Raises ``NotImplementedError`` when ``decode_stub=False`` and no real
    decoder is available (the container ships no image/audio libs).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real decoders (PIL/ffmpeg/torchaudio) are not available in this "
            "environment; run with decode_stub=True or install a decoder"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ws = np.empty(n, dtype=np.int32)
            hs = np.empty(n, dtype=np.int32)
            feats = []
            nbytes = np.empty(n, dtype=np.int64)
            for i, payload in enumerate(pdf[payload_col]):
                payload = payload or b""
                nbytes[i] = len(payload)
                ws[i], hs[i], f = _fake_features(bytes(payload))
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "modality": modality,
                    "n_bytes": nbytes,
                    "width": ws,
                    "height": hs,
                    "feature": feats,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (doc_id, frame_index) rows for a
    stub-decoded frame count — demonstrates the fan-out shape (one payload →
    many frame rows) that a real sampler would produce."""
    from pyspark.sql import functions as F

    n_frames = F.pmod(F.xxhash64("doc_id"), F.lit(300)) + F.lit(1)
    return (
        df.select("doc_id", n_frames.alias("n_frames"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_index"),
        )
    )
