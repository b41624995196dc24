"""Live HTTP round-trip for the serving surface — the reference's
integration suite re-expressed over the stdlib server
(/root/reference/tests/integration/test_api_integration.py:10-128):
health endpoints, single + batch prediction against a REAL localhost
socket, and the error→status contract (invalid base64 → 400, empty
inputs → 422, unknown route → 404)."""

import base64
import json
import threading
import urllib.error
import urllib.request

import pytest

from quality_filter import serve


@pytest.fixture(scope="module")
def base_url():
    server = serve.make_server(port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()
    t.join(timeout=5)


def _call(url, payload=None, method=None):
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"} if data else {},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


GOOD_TEXT = (
    "The committee published its annual report on Tuesday. The findings "
    "describe steady progress across all regional programs, and the "
    "members agreed to continue the review next year with wider scope."
)


def test_health_endpoints(base_url):
    status, data = _call(f"{base_url}/health")
    assert status == 200 and data["status"] == "healthy"
    status, data = _call(f"{base_url}/health/model")
    assert status == 200 and data["model_loaded"] is True


def test_single_document_roundtrip(base_url):
    status, data = _call(
        f"{base_url}/predict/document", {"text": GOOD_TEXT, "url": "http://x/a"}
    )
    assert status == 200
    # envelope matches serve.score_one's contract exactly
    local = serve.score_one(text=GOOD_TEXT, url="http://x/a")
    for k in ("status", "keep", "lang_pred", "quality_score", "scrubbed_text"):
        assert data[k] == local[k]
    assert 0.0 <= data["quality_score"] <= 1.0
    assert data["version"] == serve.VERSION and data["processing_time_ms"] >= 0


def test_single_document_html_base64(base_url):
    html = b"<html><body><p>" + GOOD_TEXT.encode() + b"</p></body></html>"
    status, data = _call(
        f"{base_url}/predict/document",
        {"html_base64": base64.b64encode(html).decode()},
    )
    assert status == 200
    assert data["scrubbed_text"] == serve.score_one(html=html)["scrubbed_text"]


def test_batch_roundtrip_matches_single(base_url):
    texts = [GOOD_TEXT, "short", GOOD_TEXT.replace("committee", "council")]
    status, data = _call(
        f"{base_url}/predict/documents",
        {"inputs": [{"text": t} for t in texts]},
    )
    assert status == 200 and len(data["results"]) == 3
    # one model pass, same labels as N single calls (predict_images contract)
    for r, t in zip(data["results"], texts):
        one = serve.score_one(text=t)
        assert (r["status"], r["keep"], r["scrubbed_text"]) == (
            one["status"], one["keep"], one["scrubbed_text"]
        )


def test_error_statuses(base_url):
    # invalid base64 → 400 (reference: test_api_integration.py:106-117)
    status, data = _call(
        f"{base_url}/predict/document", {"html_base64": "!!not-base64!!"}
    )
    assert status == 400 and data["error"] == "invalid_input"
    # missing both text and html → 400
    status, data = _call(f"{base_url}/predict/document", {})
    assert status == 400 and data["error"] == "invalid_input"
    # empty inputs list → 422 (reference: pydantic validation status)
    status, data = _call(f"{base_url}/predict/documents", {"inputs": []})
    assert status == 422 and data["error"] == "invalid_request"
    # one bad item fails the whole batch with 400 (router loop contract)
    status, data = _call(
        f"{base_url}/predict/documents",
        {"inputs": [{"text": GOOD_TEXT}, {"text": 7}]},
    )
    assert status == 400 and data["error"] == "invalid_input"
    assert "input 1" in data["detail"]
    # unknown route → 404; malformed JSON body → 400
    status, data = _call(f"{base_url}/predict/nope", {"text": "x"})
    assert status == 404
    req = urllib.request.Request(
        f"{base_url}/predict/document", data=b"{not json", method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_score_batch_direct_contract():
    out = serve.score_batch(texts=[GOOD_TEXT, None], htmls=[None, b"<p>hi</p>"])
    assert set(out) == {"results", "processing_time_ms", "version"}
    assert out["results"][0]["keep"] is True
    assert serve.score_batch(texts=[])["error"] == "invalid_request"
    assert serve.score_batch()["error"] == "invalid_request"
    assert serve.score_batch(texts=["a"], htmls=[None, None])["error"] == "invalid_request"
    assert serve.score_batch(texts=[b"bytes-not-str"])["error"] == "invalid_input"
