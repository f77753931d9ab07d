"""Document-level extraction vs frozen oracle fixtures — pandas-only
(no JVM): exercises the same batch kernels the Spark plan wraps."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocr_spark.operators.extract_batch import extract_doc_batch, extract_span_batch
from ocr_spark.sources.corpus import doc_ids, doc_spans

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "expected_spans.parquet")


@pytest.fixture(scope="module")
def expected():
    return pq.read_table(FIXTURES).to_pandas()


@pytest.fixture(scope="module")
def docs():
    ids = doc_ids(400)
    return pd.DataFrame({"doc_id": ids, "spans": [doc_spans(d) for d in ids]})


def test_doc_batch_matches_fixtures(expected, docs):
    out = pd.concat(list(extract_doc_batch(iter([docs]))), ignore_index=True)
    out = out.sort_values(["doc_id", "order"], ignore_index=True)
    exp = expected.sort_values(["doc_id", "order"], ignore_index=True)
    assert len(out) == len(exp)
    for col in ["doc_id", "order", "kind", "text", "media_ref"]:
        mism = (out[col].astype(str) != exp[col].astype(str)).sum()
        assert mism == 0, f"{mism} mismatches in {col}"


def test_span_batch_path_equals_doc_batch_path(docs):
    """The heavy (span-exploded) path must produce identical spans."""
    doc_out = pd.concat(list(extract_doc_batch(iter([docs.iloc[:80]]))), ignore_index=True)

    recs = []
    for did, spans in zip(docs["doc_id"].iloc[:80], docs["spans"].iloc[:80]):
        for s in spans:
            recs.append((did, s["kind"], s["text"], s["media_ref"], s["offset"]))
    flat = pd.DataFrame(recs, columns=["doc_id", "kind", "text", "media_ref", "offset"])
    span_out = pd.concat(list(extract_span_batch(iter([flat]))), ignore_index=True)
    span_out = span_out.sort_values(["doc_id", "offset", "seq"], ignore_index=True)
    span_out["order"] = span_out.groupby("doc_id").cumcount()

    a = doc_out.sort_values(["doc_id", "order"], ignore_index=True)
    b = span_out[["doc_id", "order", "kind", "text", "media_ref"]].sort_values(
        ["doc_id", "order"], ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_batch_invariance(docs):
    """Splitting the input into different Arrow-batch sizes must not
    change results (ordering is per-document, not per-batch)."""
    head = docs.iloc[:40]
    whole = pd.concat(list(extract_doc_batch(iter([head]))), ignore_index=True)
    chunks = [head.iloc[i : i + 7] for i in range(0, 40, 7)]
    split = pd.concat(list(extract_doc_batch(iter(chunks))), ignore_index=True)
    a = whole.sort_values(["doc_id", "order"], ignore_index=True)
    b = split.sort_values(["doc_id", "order"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_arrow_kernel_matches_pandas_kernel():
    """extract_doc_batch_arrow (mapInArrow fast path) must emit exactly
    the rows of extract_doc_batch (pandas reference semantics)."""
    import pandas as pd
    import pyarrow as pa

    from ocr_spark.operators.extract_batch import (
        extract_doc_batch,
        extract_doc_batch_arrow,
    )
    from ocr_spark.sources.corpus import doc_spans

    ids = [f"doc-{i:08d}" for i in range(60)]
    pdf = pd.DataFrame({"doc_id": ids, "spans": [doc_spans(d) for d in ids]})
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    rb = pa.RecordBatch.from_pydict(
        {
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(list(pdf["spans"]), pa.list_(span_t)),
        }
    )
    got_pd = pd.concat(list(extract_doc_batch(iter([pdf])))).reset_index(drop=True)
    got_ar = pa.Table.from_batches(
        list(extract_doc_batch_arrow(iter([rb])))
    ).to_pandas()
    a = sorted(map(tuple, got_pd.itertuples(index=False)))
    b = sorted(map(tuple, got_ar.itertuples(index=False)))
    assert a == b and len(a) > 0

    # empty batch and empty-spans rows
    empty = pa.RecordBatch.from_pydict(
        {"doc_id": pa.array([], pa.string()), "spans": pa.array([], pa.list_(span_t))}
    )
    assert list(extract_doc_batch_arrow(iter([empty]))) == []
    nospans = pa.RecordBatch.from_pydict(
        {"doc_id": pa.array(["d1"]), "spans": pa.array([[]], pa.list_(span_t))}
    )
    out = list(extract_doc_batch_arrow(iter([nospans])))
    assert sum(len(x) for x in out) == 0


def test_broadcast_weights_flow_into_recognition():
    """The weights dict is a real input: the default (identity
    projection) reproduces the frozen outputs, and a permuted
    projection provably changes decoded text — the broadcast isn't
    decorative."""
    import numpy as np

    from ocr_spark.operators.postprocess import extract_media_span
    from ocr_spark.sources.corpus import doc_spans
    from ocr_spark.sources.weights import default_weights

    refs = [
        s["media_ref"]
        for i in range(40)
        for s in doc_spans(f"doc-{i:08d}")
        if s["kind"] == "media"
    ]
    w = default_weights()
    assert all(
        extract_media_span(r) == extract_media_span(r, w) for r in refs
    )

    perm = default_weights()
    p = np.eye(len(perm["alphabet"]))
    p[[0, 1]] = p[[1, 0]]  # swap classes '1' and '0'
    perm["projection"] = p
    changed = sum(
        extract_media_span(r, perm) != extract_media_span(r, w) for r in refs
    )
    assert changed > 0
