"""S5 HTTP inference source (sources/http_infer.py) against a REAL
in-process scoring service (http.server) — transport, form encoding,
keep-alive reuse, retry/backoff, and the reference's JSON->row parse
(evaluate_data.py:322-333 bbox arithmetic + label_replace +
eval_label) are all genuinely exercised end to end."""

from __future__ import annotations

import base64
import hashlib
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ocr_spark.functions.arith import eval_verdict
from ocr_spark.functions.text_clean import normalize_text
from ocr_spark.sources.http_infer import http_score_media


def fake_questions(payload: bytes) -> list[dict]:
    """Deterministic scoring-service response derived from the payload
    bytes — what the mock model 'sees'. Includes a correct equation, a
    wrong one, and a fullwidth-glyph label so the F1 normalization
    path has real work."""
    h = hashlib.md5(payload).hexdigest()
    a, b = int(h[:2], 16), int(h[2:4], 16)
    return [
        {
            "questionContext": f"{a}+{b}={a + b}",
            "leftX": a,
            "topY": b,
            "questionWidth": 10 + a % 5,
            "questionHeight": 7,
        },
        {
            "questionContext": f"{a}-{b}={a - b + 1}",
            "leftX": 2 * a,
            "topY": 3,
            "questionWidth": 9,
            "questionHeight": 5,
        },
        {
            "questionContext": "１＋２＝3",
            "leftX": 0,
            "topY": 0,
            "questionWidth": 1,
            "questionHeight": 1,
        },
    ]


def expected_rows(ref: str, payload: bytes) -> list[tuple]:
    rows = []
    for i, q in enumerate(fake_questions(payload)):
        out = normalize_text(q["questionContext"])
        rows.append(
            (
                ref,
                i,
                q["leftX"],
                q["topY"],
                q["leftX"] + q["questionWidth"],
                q["topY"] + q["questionHeight"],
                out,
                eval_verdict(out),
            )
        )
    return rows


class _ScoreHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive, like a real service
    fail_first = 0  # 500 the first N requests (shared, lock-guarded)
    _lock = threading.Lock()
    requests_seen: list[dict] = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        fields = dict(urllib.parse.parse_qsl(body))
        with self._lock:
            type(self).requests_seen.append(
                {k: v for k, v in fields.items() if k != "content"}
            )
            if len(type(self).requests_seen) <= type(self).fail_first:
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
        payload = base64.b64decode(fields["content"])
        data = json.dumps({"questionImgs": fake_questions(payload)}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture
def score_server():
    _ScoreHandler.fail_first = 0
    _ScoreHandler.requests_seen = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ScoreHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/score/"
    srv.shutdown()
    srv.server_close()


PAYLOADS = [(f"m-{i:03d}", hashlib.sha256(bytes([i])).digest()) for i in range(6)]


def _media_df(spark):
    return spark.createDataFrame(
        PAYLOADS, "media_ref string, payload binary"
    ).repartition(2)


def test_http_score_matches_reference_parse(spark, score_server):
    got = sorted(
        tuple(r)
        for r in http_score_media(
            _media_df(spark), score_server, "sk", "ak"
        ).collect()
    )
    want = sorted(
        row for ref, payload in PAYLOADS for row in expected_rows(ref, payload)
    )
    assert got == want
    # the form fields the reference sends (minus the image) arrived
    assert all(
        r == {"secretkey": "sk", "appkey": "ak"}
        for r in _ScoreHandler.requests_seen
    )
    assert len(_ScoreHandler.requests_seen) == len(PAYLOADS)


def test_http_score_retries_transient_failures(spark, score_server):
    _ScoreHandler.fail_first = 2  # first two requests 500
    df = spark.createDataFrame(
        PAYLOADS[:1], "media_ref string, payload binary"
    ).coalesce(1)
    rows = http_score_media(
        df, score_server, max_retries=4, backoff_s=0.01
    ).collect()
    assert sorted(tuple(r) for r in rows) == sorted(
        expected_rows(*PAYLOADS[0])
    )
    assert len(_ScoreHandler.requests_seen) >= 3  # 2 failures + success


def test_http_score_raises_after_max_retries(spark, score_server):
    _ScoreHandler.fail_first = 10**9  # always failing service
    df = spark.createDataFrame(
        PAYLOADS[:1], "media_ref string, payload binary"
    ).coalesce(1)
    with pytest.raises(Exception, match="HTTP 500|scoring service"):
        http_score_media(
            df, score_server, max_retries=1, backoff_s=0.01
        ).collect()
