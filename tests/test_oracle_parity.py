"""Mimics the driver's correctness gate: run every oracle-checked
query on Spark AND its DuckDB oracle SQL at sf0.01, compare row count,
column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


CHECKED = sorted(entry.oracle_sql().keys())


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, duck, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    a = _canon(spark_cols, spark_rows)
    b = _canon(duck_cols, duck_rows)
    mismatches = sum(1 for x, y in zip(a, b) if x != y)
    assert mismatches == 0, f"{name}: {mismatches}/{len(a)} rows differ; first: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )


def test_every_query_has_oracle_or_is_extraction():
    qs = entry.queries()
    unchecked = set(qs) - set(entry.oracle_sql())
    assert all(k.startswith("ocr_") for k in unchecked), unchecked


# Production-shaped queries that MUST stay inside the driver's gate
# window (the first 50 entries of QUERIES, checked in insertion order).
# Round 3 lost 12 relational green rows by inserting new queries ahead
# of them — this pins the membership so it can't regress silently.
GATE_WINDOW = 50
# r5 rotation (VERDICT r4 #4 — re-arm hard gates periodically):
# ocr_extract_text_spans, sparse_label_encode, knn_cosine_ivf_probe2
# and banded_pairs_bucket_cap rotated INTO the window;
# value_percentiles (exact values still emitted and gated through
# approx_percentile_check), dup_clusters_banded (content feeds the
# gated dedup_corpus), ivf_recall (same recall gate runs gated via
# ivf_kmeans_recall) and contamination_check (gated r4) rotated out —
# all four keep their local DuckDB parity gate in this file.
# Late-r5: seq_pack_plan (new packing family) rotated IN, demoting
# approx_distinct_check (sketch family stays gated via
# approx_percentile_check; the demoted entry keeps local parity here);
# then bpe_pair_counts (new tokenizer family) rotated IN, demoting
# order_priority_counts (TPC-H keeps four gated rows; the demoted
# entry keeps local parity here). Final r5 rotation: bpe_pack_plan
# (tokenize-and-pack) replaces seq_pack_plan in the window — a strict
# content superset (same _pack_from_counts two-phase prefix scan, but
# counts come from BPE segmentation); seq_pack_plan keeps local parity.
GATED_REQUIRED = {
    # extraction
    "ocr_extract_spans", "ocr_extract_invariants", "ocr_extract_text_spans",
    # text stats / functions — r5 additions: token_count and
    # doc_fingerprint rotated below the line (families stay gated via
    # bpe_token_count / rolling_fingerprint+char_vocab) to make window
    # room for the two NEW corpus-construction families
    "clean_text", "cjk_boilerplate_filter",
    # end-of-r5 rotation: bigram_lm_scores (corpus-trained LM quality,
    # a new model face) took quality_score's slot; quality_score keeps
    # local parity below the line
    "bpe_token_count", "rolling_fingerprint", "bigram_lm_scores",
    "stopword_fraction", "repetition_ratio", "lang_id",
    "char_vocab", "length_histogram",
    "edit_distance", "arith_verdict_udf",
    "sparse_label_encode",
    # corpus construction (new r5 family): line-level exact dedup,
    # deterministic stratified sampling, and sequence-packing placement
    "line_dedup_stats", "stratified_sample", "bpe_pack_plan",
    # tokenizer training (new late-r5 family)
    "bpe_pair_counts",
    # dedup (production-shaped)
    "dedup_exact", "minhash_banded_pairs", "minhash_banded_recall",
    "simhash_hamming_pairs", "dedup_corpus",
    "banded_pairs_bucket_cap", "jaccard_banded_pairs",
    # similarity / ANN — closing-r5 rotation: knn_cosine_topk (the
    # exact-kNN yardstick, four straight green driver rows) moved
    # below the line to arm dsir_weights' first row; the family keeps
    # the four production-shaped gates listed here
    "knn_cosine_ivf", "embedding_near_dup",
    "knn_cosine_ivf_probe2", "ivf_kmeans_recall",
    # importance-weighted data selection (new closing-r5 family face)
    "dsir_weights",
    # multimodal
    "media_catalog", "ocr_media_decode_stats", "ocr_media_frame_sample",
    # evaluation / geometry
    "eval_iou_pairs", "eval_metrics", "straddle_prune",
    # pairing / windows / relational
    "mutual_nearest_pair", "topk_per_group", "value_band_join",
    "sessionize", "moving_avg", "unmatched_events",
    "approx_percentile_check",
    # TPC-H family
    "pricing_summary", "top_revenue_orders", "event_rollup",
    "local_supplier_volume",
    # bucketed layout (zero-exchange co-located join)
    "bucketed_order_revenue",
}


def test_gate_window_covers_every_family():
    window = list(entry.queries())[:GATE_WINDOW]
    missing = GATED_REQUIRED - set(window)
    assert not missing, (
        f"queries pushed out of the driver's {GATE_WINDOW}-entry gate "
        f"window: {sorted(missing)} — reorder QUERIES in __spark_entry__.py"
    )


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
