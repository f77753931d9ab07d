"""S5 — HTTP inference source (the reference's only network hop).

Reference semantics (evaluate_data.py:20-34 ``get_json_result``,
:322-333 ``json_to_result``): POST a form-encoded
``{'secretkey', 'appkey', 'content': base64(image_bytes)}`` to a
scoring service, then explode the response JSON's ``questionImgs``
into per-question rows with

- bbox = [leftX, topY, leftX + questionWidth, topY + questionHeight]
  (width/height are ADDED to the corner, the reference's convention),
- output = label_replace(questionContext)  (F1 normalization),
- state  = eval_label(output)              (F2 verdict).

Spark-first shape (SURVEY §2.1 S5 row): a ``mapInPandas`` source.
Each TASK lazily opens ONE persistent HTTP connection (http.client
keep-alive, re-opened on error) and walks its Arrow batches row by
row, exactly as the reference walks image files — so cluster-wide
request concurrency equals the number of concurrent tasks, and the
rate limit against the scoring service is set by ``repartition(n)``
(the Spark-native throttle), never by a driver-side loop. Requests
retry with bounded exponential backoff; a request that still fails
after ``max_retries`` raises and fails the task, handing redelivery
to Spark's task-retry machinery (at-least-once against an idempotent
scoring POST). At 10^12 documents nothing ever lands on the driver:
payload bytes stream Arrow-batch by Arrow-batch through the python
workers.

Tested end-to-end against a real in-process ``http.server`` scoring
stub (tests/test_http_infer.py) — the transport, form encoding,
retry path and JSON->row parse are all genuinely exercised; only the
remote model behind the URL is out of scope, per SURVEY.
"""

from __future__ import annotations

import base64
import http.client
import json
import time
import urllib.parse
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RESULT_SCHEMA = (
    "media_ref string, q_index int, x0 int, y0 int, x1 int, y1 int, "
    "output string, state string"
)


def _post_form(conn_holder, parsed, fields, max_retries, backoff_s, timeout_s):
    """One form-encoded POST with keep-alive reuse + bounded backoff."""
    body = urllib.parse.urlencode(fields)
    headers = {"Content-Type": "application/x-www-form-urlencoded"}
    last = None
    for attempt in range(max_retries + 1):
        try:
            if conn_holder[0] is None:
                cls = (
                    http.client.HTTPSConnection
                    if parsed.scheme == "https"
                    else http.client.HTTPConnection
                )
                conn_holder[0] = cls(
                    parsed.hostname, parsed.port, timeout=timeout_s
                )
            conn_holder[0].request("POST", parsed.path or "/", body, headers)
            resp = conn_holder[0].getresponse()
            data = resp.read()
            if resp.status != 200:
                raise OSError(f"scoring service returned HTTP {resp.status}")
            return json.loads(data)
        except Exception as exc:  # noqa: BLE001 — any transport error retries
            last = exc
            if conn_holder[0] is not None:
                try:
                    conn_holder[0].close()
                except Exception:  # noqa: BLE001
                    pass
                conn_holder[0] = None
            if attempt == max_retries:
                raise
            time.sleep(backoff_s * (2**attempt))
    raise last  # unreachable; keeps type-checkers honest


def http_score_media(
    media: DataFrame,
    base_url: str,
    secretkey: str = "",
    appkey: str = "",
    *,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    timeout_s: float = 10.0,
) -> DataFrame:
    """(media_ref, payload:binary) -> per-question scoring rows.

    One POST per media row (the reference's per-image granularity),
    response exploded to (media_ref, q_index, x0, y0, x1, y1, output,
    state) with the reference's bbox arithmetic, F1 normalization and
    F2 verdict applied worker-side.
    """
    from ocr_spark.functions.arith import eval_verdict  # noqa: PLC0415
    from ocr_spark.functions.text_clean import normalize_text  # noqa: PLC0415

    parsed = urllib.parse.urlsplit(base_url)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn_holder = [None]  # one keep-alive connection per task
        try:
            for pdf in batches:
                rows: list[tuple] = []
                for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                    j = _post_form(
                        conn_holder,
                        parsed,
                        {
                            "secretkey": secretkey,
                            "appkey": appkey,
                            "content": base64.b64encode(bytes(payload)).decode(),
                        },
                        max_retries,
                        backoff_s,
                        timeout_s,
                    )
                    for i, q in enumerate(j["questionImgs"]):
                        x0, y0 = int(q["leftX"]), int(q["topY"])
                        out = normalize_text(str(q["questionContext"]))
                        rows.append(
                            (
                                ref,
                                i,
                                x0,
                                y0,
                                x0 + int(q["questionWidth"]),
                                y0 + int(q["questionHeight"]),
                                out,
                                eval_verdict(out),
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_ref",
                        "q_index",
                        "x0",
                        "y0",
                        "x1",
                        "y1",
                        "output",
                        "state",
                    ],
                )
        finally:
            if conn_holder[0] is not None:
                try:
                    conn_holder[0].close()
                except Exception:  # noqa: BLE001
                    pass

    return media.select("media_ref", "payload").mapInPandas(
        kernel, schema=RESULT_SCHEMA
    )
