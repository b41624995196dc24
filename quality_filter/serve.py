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
    out = _row_envelope(row)
    out["processing_time_ms"] = round((time.perf_counter() - t0) * 1000, 3)
    out["version"] = VERSION
    return out


def _row_envelope(row) -> dict[str, Any]:
    """One oracle row → the JSON-safe per-document result fields."""
    return {
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
    }


def score_batch(
    texts: list[str | None] | None = None,
    htmls: list[bytes | None] | None = None,
    urls: list[str] | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> dict[str, Any]:
    """Score N documents in ONE model pass — the reference's batch verb
    (`POST /predict/images`, /root/reference/app/routers/prediction.py:80-120):
    every input is validated up front (one bad item fails the whole
    request with an invalid_input envelope, exactly as the router raises
    InvalidInputError mid-loop), then the full batch goes through a
    single `run_oracle` call on a multi-row frame, so per-document cost
    is model math, not per-request setup.

    Returns ``{"results": [per-doc envelope...], "processing_time_ms",
    "version"}`` on success.  An EMPTY batch is a request-shape error
    (the reference's pydantic ``min_length=1`` → 422) and returns
    ``error="invalid_request"`` rather than ``invalid_input``."""
    import pandas as pd

    from quality_filter.oracle import run_oracle

    t0 = time.perf_counter()
    n = max(len(texts or []), len(htmls or []))
    if texts is None and htmls is None or n == 0:
        return {
            "error": "invalid_request",
            "detail": "provide a non-empty texts and/or htmls list",
            "version": VERSION,
        }
    texts = list(texts) if texts is not None else [None] * n
    htmls = list(htmls) if htmls is not None else [None] * n
    if len(texts) != len(htmls):
        return {
            "error": "invalid_request",
            "detail": "texts and htmls must have equal length",
            "version": VERSION,
        }
    for i, (text, html) in enumerate(zip(texts, htmls)):
        detail = None
        if text is None and html is None:
            detail = f"input {i}: provide text or html"
        elif text is not None and not isinstance(text, str):
            detail = f"input {i}: text must be a string"
        elif html is not None and not isinstance(html, (bytes, bytearray)):
            detail = f"input {i}: html must be bytes"
        if detail:
            return {"error": "invalid_input", "detail": detail, "version": VERSION}

    if urls is None:
        urls = [f"request://batch/{i}" for i in range(n)]
    cfg, lid, lm = _get_runtime(artifact_dir)
    frame = pd.DataFrame(
        {"url": urls, "warc_ts": [pd.Timestamp.now()] * n, "html": htmls,
         "text": texts, "lang": [None] * n}
    )
    res = run_oracle(frame, cfg, artifact_dir, models=(lid, lm))
    return {
        "results": [_row_envelope(row) for _, row in res.iterrows()],
        "processing_time_ms": round((time.perf_counter() - t0) * 1000, 3),
        "version": VERSION,
    }


def make_server(port: int = 0, artifact_dir: str = DEFAULT_ARTIFACT_DIR):
    """Stdlib HTTP app over the scoring surface — the reference's
    FastAPI service re-expressed with zero web dependencies
    (/root/reference/app/main.py, routers/prediction.py, routers/health).

    Routes (JSON in / JSON out):
      GET  /health            → 200 {"status": "healthy"}
      GET  /health/model      → 200 {..., "model_loaded": bool}  (true
                                once the artifact singleton is warm)
      POST /predict/document  → score_one;  invalid input → 400
      POST /predict/documents → score_batch; invalid item → 400,
                                empty/malformed batch shape → 422 (the
                                reference's pydantic-validation status)
      anything else           → 404; non-JSON body → 400; bug → 500

    Startup warms the singleton eagerly (the app/main.py:14-20 lifespan
    lesson).  Returns a ``ThreadingHTTPServer``; callers own
    ``serve_forever``/``shutdown``.  ``port=0`` binds an ephemeral port
    (``server.server_address[1]``)."""
    import base64
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    warm_up(artifact_dir)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: no per-request stderr spam
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/health", "/health/"):
                return self._reply(200, {"status": "healthy", "version": VERSION})
            if self.path == "/health/model":
                return self._reply(
                    200,
                    {"status": "healthy", "version": VERSION,
                     "model_loaded": artifact_dir in _CACHE},
                )
            return self._reply(404, {"error": "not_found", "detail": self.path})

        def do_POST(self):
            try:
                raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                try:
                    req = json.loads(raw or b"{}")
                    if not isinstance(req, dict):
                        raise ValueError("body must be a JSON object")
                except ValueError as e:
                    return self._reply(400, {"error": "invalid_json", "detail": str(e)})

                class BadBase64(Exception):
                    pass

                def html_of(d):
                    b64 = d.get("html_base64")
                    try:
                        return None if b64 is None else base64.b64decode(b64, validate=True)
                    except Exception as e:
                        # the reference's invalid-base64 → 400 contract
                        # (tests/integration/test_api_integration.py:106-117)
                        raise BadBase64(str(e)) from e

                try:
                    if self.path == "/predict/document":
                        out = score_one(
                            text=req.get("text"), html=html_of(req),
                            url=req.get("url", "request://single"),
                            artifact_dir=artifact_dir,
                        )
                        return self._reply(400 if "error" in out else 200, out)
                    if self.path == "/predict/documents":
                        inputs = req.get("inputs")
                        if not isinstance(inputs, list) or not inputs or not all(
                            isinstance(d, dict) for d in inputs
                        ):
                            return self._reply(
                                422,
                                {"error": "invalid_request",
                                 "detail": "inputs must be a non-empty list of objects",
                                 "version": VERSION},
                            )
                        out = score_batch(
                            texts=[d.get("text") for d in inputs],
                            htmls=[html_of(d) for d in inputs],
                            urls=[d.get("url", f"request://batch/{i}")
                                  for i, d in enumerate(inputs)],
                            artifact_dir=artifact_dir,
                        )
                        if out.get("error") == "invalid_request":
                            return self._reply(422, out)
                        return self._reply(400 if "error" in out else 200, out)
                except BadBase64 as e:
                    return self._reply(
                        400,
                        {"error": "invalid_input",
                         "detail": f"html_base64: {e}", "version": VERSION},
                    )
                return self._reply(404, {"error": "not_found", "detail": self.path})
            except Exception as e:  # the router's 500 catch-all
                return self._reply(500, {"error": "internal", "detail": str(e)})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
