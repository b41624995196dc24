"""Model-bearing scoring stage: language-ID + LM perplexity.

One iterator-form pandas UDF = one Arrow batch per model call, with the
artifacts loaded ONCE per python worker and cached at module level —
exactly the global-model singleton pattern of the reference
(/root/reference/opennsfw2/_inference.py:18-27) plus its batched-inference
mandate ("don't call the model per row", _inference.py:64-84).

Artifact resolution order (executor side):
  1. explicit path baked into the UDF closure (local mode / tests)
  2. SparkFiles.get(...) for cluster runs shipped via --files
Never downloads at task time (anti-_download.py).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# per-python-worker cache: artifact_dir -> (LangIdModel, CharLM)
_MODEL_CACHE: dict[str, tuple] = {}

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


def _resolve_artifact_dir(artifact_dir: str) -> str:
    if os.path.isdir(artifact_dir):
        return artifact_dir
    try:  # cluster: shipped via spark-submit --files langid.npz,lm.npz,rules.json
        from pyspark import SparkFiles

        cand = SparkFiles.getRootDirectory()
        if os.path.exists(os.path.join(cand, "langid.npz")):
            return cand
    except Exception:
        pass
    raise FileNotFoundError(f"model artifacts not found: {artifact_dir}")


def _get_models(artifact_dir: str):
    models = _MODEL_CACHE.get(artifact_dir)
    if models is None:
        from quality_filter.models.langid import LangIdModel
        from quality_filter.models.lm import CharLM

        d = _resolve_artifact_dir(artifact_dir)
        models = (
            LangIdModel.load(os.path.join(d, "langid.npz")),
            CharLM.load(os.path.join(d, "lm.npz")),
        )
        _MODEL_CACHE[artifact_dir] = models
    return models


def make_score_udf(artifact_dir: str, profile: str = "FULL"):
    """Factory: (text) -> struct<lang_pred, lang_conf, ppl> pandas UDF."""

    @F.pandas_udf(SCORE_SCHEMA)
    def score_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from quality_filter.models.hashing import char_codes

        lid, lm = _get_models(artifact_dir)
        for texts in batches:
            tl = [t if isinstance(t, str) else None for t in texts]
            # one lowercase+decode pass per text, shared by both models
            codes = [char_codes(t.lower()) if t else None for t in tl]
            labels, confs = lid.predict_batch_codes(codes)
            if profile == "FULL":
                ppl = lm.perplexity_batch_codes(codes)
            else:  # FAST profile skips the LM (the SIMPLE-preprocessing
                # analog, /root/reference/opennsfw2/_image.py:55-59)
                ppl = [0.0] * len(tl)
            yield pd.DataFrame(
                {"lang_pred": labels, "lang_conf": confs, "ppl": ppl}
            )

    return score_udf
