"""One-shot fixture freezer (FIXTURES.md §2).

Runs the sequential oracle (tools/oracle.py — independent
transcriptions of the reference's decision logic) over the first
N_DOCS documents of the deterministic corpus and freezes the expected
extracted span sequences to tests/fixtures/expected_spans.parquet.
Tests compare ENGINE output against this frozen table; the oracle is
never imported at test time.

Run:  python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.sources.corpus import doc_ids, doc_spans  # noqa: E402
from tools.oracle import extract_document  # noqa: E402

N_DOCS = 400
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "expected_spans.parquet")


def main() -> None:
    rows = {"doc_id": [], "order": [], "kind": [], "text": [], "media_ref": []}
    n_heavy = 0
    n_spans = 0
    for did in doc_ids(N_DOCS):
        spans = doc_spans(did)
        if sum(1 for s in spans if s["kind"] == "media") > 16:
            n_heavy += 1
        for order, (kind, text, media_ref) in enumerate(extract_document(spans)):
            rows["doc_id"].append(did)
            rows["order"].append(order)
            rows["kind"].append(kind)
            rows["text"].append(text)
            rows["media_ref"].append(media_ref)
            n_spans += 1
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "order": pa.array(rows["order"], pa.int32()),
            "kind": pa.array(rows["kind"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "media_ref": pa.array(rows["media_ref"], pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"froze {n_spans} spans for {N_DOCS} docs ({n_heavy} heavy) -> {OUT}")


if __name__ == "__main__":
    main()
