"""Multimodal binary-column plumbing: deterministic payload synthesis,
stubbed decode, frame sampling. Checks the Spark-side contracts
(schema, determinism, flat-map batch shape, codec stub) — the catalog
itself is oracle-checked in test_oracle_parity.py."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_spark.operators import multimodal as mm
from ocr_spark.plans.extract import corpus_df


@pytest.fixture(scope="module")
def refs(spark):
    return mm.media_refs(corpus_df(spark, 40)).cache()


def test_payload_deterministic_and_typed(spark, refs):
    a = {r["media_ref"]: bytes(r["payload"]) for r in mm.with_payload(refs).collect()}
    b = {r["media_ref"]: bytes(r["payload"]) for r in mm.with_payload(refs).collect()}
    assert a == b
    assert all(len(p) == 4096 for p in a.values())
    assert len(a) == refs.count()


def test_decode_stats_schema_and_values(spark, refs):
    out = mm.decode_stats(refs)
    assert out.columns == ["media_ref", "height", "width", "mean_px", "std_px"]
    rows = out.collect()
    assert len(rows) == refs.count()
    assert all(r["height"] == 8 and r["width"] == 8 for r in rows)
    assert all(0.0 <= r["mean_px"] <= 255.0 for r in rows)
    # decode is a pure function of the payload
    again = mm.decode_stats(refs).collect()
    assert sorted((r["media_ref"], r["mean_px"]) for r in rows) == sorted(
        (r["media_ref"], r["mean_px"]) for r in again
    )


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        next(
            mm.decode_media_batch(
                iter([pd.DataFrame({"media_ref": ["m-x"], "payload": [b"\0" * 64]})]),
                codec="real",
            )
        )


def test_frame_sample_flatmap(spark, refs):
    cat = mm.media_catalog(refs)
    videos = {
        r["media_ref"]: r["n_frames"]
        for r in cat.where("media_type = 'video'").collect()
    }
    out = mm.sampled_frames(refs, every=5)
    rows = out.collect()
    by_ref: dict[str, list[int]] = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert set(by_ref) == {ref for ref, nf in videos.items()}
    for ref, idxs in by_ref.items():
        assert sorted(idxs) == list(range(0, videos[ref], 5))


def test_corpus_style_refs_match_generator(spark, refs):
    """The expression-level sha256 ref derivation reproduces the
    corpus generator's refs exactly: for every document whose offset-0
    span is media, corpus_style_refs(doc_id row) == the ref the
    generator emitted for (doc_id, offset 0)."""
    from ocr_spark.sources.corpus import doc_spans

    expected = {}
    for i in range(40):
        did = f"doc-{i:08d}"
        s0 = doc_spans(did)[0]
        if s0["kind"] == "media":
            expected[i] = s0["media_ref"]
    assert expected, "no doc with a media span at offset 0 in the sample"
    doc_table = spark.createDataFrame([(i,) for i in expected], "doc_id long")
    derived = {
        r["media_ref"] for r in mm.corpus_style_refs(doc_table).collect()
    }
    assert derived == set(expected.values())


def test_catalog_agrees_between_ref_sources(spark, refs):
    """The catalog derivation is source-agnostic: same metadata columns
    for corpus refs and doc-table refs."""
    docs_table = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c2 = mm.media_catalog(mm.refs_from_doc_table(docs_table))
    assert c2.columns == [
        "media_ref", "media_type", "format", "width", "height", "n_frames", "n_bytes",
    ]
    assert c2.count() == docs_table.count()
    r = c2.first()
    assert r["n_bytes"] == r["width"] * r["height"] * 3 * r["n_frames"]
