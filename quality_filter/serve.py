"""Single-request scoring surface — the online entry point.

The reference ships an HTTP app whose core is a warm process-global
model singleton serving one image per request
(/root/reference/app/services/prediction_service.py:14-39,
/root/reference/app/routers/prediction.py:30-77).  The batch engine's
analog for "score THIS document right now" is this module: the ORACLE
path (pure Python — identical labels to the Spark engine by the parity
contract) behind a thread-safe lazily-initialized artifact singleton,
so per-request latency is model math, not artifact reload or a Spark
job.  Wire it into any server framework; no web dependency here.

Error mapping follows the reference's router (InvalidInput → 400-class
envelope, never a raised exception for malformed payloads — the same
quarantine discipline as the pipeline).
"""

from __future__ import annotations

import threading
import time
from typing import Any

from quality_filter.config import DEFAULT_ARTIFACT_DIR

VERSION = "3.0"

_LOCK = threading.Lock()
_CACHE: dict[str, tuple] = {}


def _get_runtime(artifact_dir: str):
    """Double-checked-lock artifact singleton (the prediction_service
    pattern): one (cfg, langid, lm) triple per artifact dir per process."""
    rt = _CACHE.get(artifact_dir)
    if rt is None:
        with _LOCK:
            rt = _CACHE.get(artifact_dir)
            if rt is None:
                from quality_filter.config import load_config
                from quality_filter.models.langid import LangIdModel
                from quality_filter.models.lm import CharLM

                rt = (
                    load_config(artifact_dir),
                    LangIdModel.load(f"{artifact_dir}/langid.npz"),
                    CharLM.load(f"{artifact_dir}/lm.npz"),
                )
                _CACHE[artifact_dir] = rt
    return rt


def warm_up(artifact_dir: str = DEFAULT_ARTIFACT_DIR) -> None:
    """Eager init at service startup (the app/main.py:14-20 lesson:
    never pay artifact load on the first request)."""
    _get_runtime(artifact_dir)


def score_one(
    text: str | None = None,
    html: bytes | None = None,
    url: str = "request://single",
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> dict[str, Any]:
    """Score one document; returns a JSON-safe envelope with the same
    fields as a pipeline output row plus processing_time_ms + version
    (the response-envelope contract,
    /root/reference/app/pydantic_models.py:90-106).

    Labels are IDENTICAL to the batch engines: this calls the oracle
    spec (`quality_filter.oracle.run_oracle`) on a one-row frame, and
    the Spark engine is pinned to the oracle by the parity suite."""
    import pandas as pd

    from quality_filter.oracle import run_oracle

    t0 = time.perf_counter()
    if text is None and html is None:
        return {
            "error": "invalid_input",
            "detail": "provide text or html",
            "version": VERSION,
        }
    if text is not None and not isinstance(text, str):
        return {
            "error": "invalid_input",
            "detail": "text must be a string",
            "version": VERSION,
        }
    if html is not None and not isinstance(html, (bytes, bytearray)):
        return {
            "error": "invalid_input",
            "detail": "html must be bytes",
            "version": VERSION,
        }

    cfg, lid, lm = _get_runtime(artifact_dir)
    frame = pd.DataFrame(
        {"url": [url], "warc_ts": [pd.Timestamp.now()], "html": [html],
         "text": [text], "lang": [None]}
    )
    row = run_oracle(frame, cfg, artifact_dir, models=(lid, lm)).iloc[0]
    out = {
        "url": row["url"],
        "status": row["status"],
        "keep": bool(row["keep"]),
        "reasons": list(row["reasons"] or []),
        "lang_pred": row["lang_pred"],
        "lang_conf": None if row["lang_conf"] is None else float(row["lang_conf"]),
        "ppl": None if row["ppl"] is None else float(row["ppl"]),
        "quality_score": None if row["quality_score"] is None else float(row["quality_score"]),
        "tox_score": None if row["tox_score"] is None else float(row["tox_score"]),
        "scrubbed_text": row["scrubbed_text"],
        "contribs": None if row["contribs"] is None else dict(row["contribs"]),
        "processing_time_ms": round((time.perf_counter() - t0) * 1000, 3),
        "version": VERSION,
    }
    return out
