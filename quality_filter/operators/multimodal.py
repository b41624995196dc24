"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `payload BINARY` plus a
typed metadata struct — the same pattern as `html BINARY` in the pages
table and the reference's image-handle input
(/root/reference/opennsfw2/_inference.py:30-41).  Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` stages with per-worker
codec caching, exactly like the text model stage.

The actual pixel/sample decoding is STUBBED: no image/audio libraries
exist in this container.  If PIL/soundfile appear on a real cluster the
stubs raise-or-route to them; otherwise a clearly-marked deterministic
fake keeps the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("payload_crc", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _try_real_decoder():
    """Real decode path if an imaging library exists (gated import —
    the lazy-dependency lesson, /root/reference/opennsfw2/_compat.py)."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _stub_features(payload: bytes, dim: int = IMAGE_FEATURE_DIM) -> np.ndarray:
    """STUB: deterministic pseudo-features from a digest of the payload.
    Stands in for resize(224,224) → CNN embedding; replace with a real
    decoder on a cluster that has one."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas media decode/featurize stage.

    One Arrow batch per kernel invocation (the B-row batched-inference
    contract, /root/reference/opennsfw2/_inference.py:64-84); malformed
    payloads set decode_ok=false instead of failing the task (quarantine
    discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _try_real_decoder()
        for pdf in batches:
            n = len(pdf)
            feats, ok, sizes, crcs = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None); ok.append(False)
                    sizes.append(None); crcs.append(None)
                    continue
                b = bytes(payload)
                sizes.append(len(b))
                crcs.append(zlib.crc32(b))
                try:
                    if pil is not None:
                        raise NotImplementedError(
                            "real decoder wiring is cluster-specific"
                        )
                    feats.append(_stub_features(b).tolist())
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pd.array(sizes, dtype="Int64"),
                    "payload_crc": pd.array(crcs, dtype="Int64"),
                    "features": feats,
                    "decode_ok": ok,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 8) -> DataFrame:
    """Video frame-sampling analog over media rows: keep every k-th row
    per url ordered by media_id — the frame_interval decimation
    (/root/reference/opennsfw2/_inference.py:205) on binary rows."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("url").orderBy("media_id"))
    return (
        df.withColumn("rn", rn)
        .filter((F.col("rn") == 1) | ((F.col("rn") + 1) % every_k == 0))
        .drop("rn")
    )


def generate_media(n: int, seed: int = 11) -> pd.DataFrame:
    """Deterministic synthetic media table (payloads are random bytes —
    the engine treats them as opaque)."""
    import random

    rnd = random.Random(seed)
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = None if rnd.random() < 0.05 else rnd.randbytes(rnd.randint(64, 4096))
        meta = (
            rnd.choice((320, 640, 1024)) if kind == "image" else None,
            rnd.choice((240, 480, 768)) if kind == "image" else None,
            16000 if kind == "audio" else None,
            round(rnd.uniform(1, 300), 3) if kind != "image" else None,
        )
        # rows sharing a url form one media group (e.g. frames of a video)
        group = i // 15
        rows.append((i, f"https://host{group % 7:02d}.example.com/m/{group}", kind, payload, meta))
    return pd.DataFrame(
        rows, columns=["media_id", "url", "kind", "payload", "meta"]
    )
