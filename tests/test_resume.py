"""Checkpoint-resumability of the snapshot store (north_rule: restart
from checkpoint with no duplication and no loss; per-partition lineage
+ metrics committed atomically with each snapshot).

Scenario mirrors the production failure mode: the job dies partway
through (here: injected after the first commit group), a fresh process
resumes against the same output root, and the final table must equal a
single clean run exactly.
"""

from __future__ import annotations

import pytest

from ocr_spark.plans.extract import corpus_df, extract
from ocr_spark.plans.io import SnapshotStore, run_extract_job

N_DOCS = 120
N_BUCKETS = 8
GROUP = 2


def _rows(df):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.select("doc_id", "order", "kind", "text", "media_ref").collect()
    )


@pytest.fixture(scope="module")
def docs(spark):
    return corpus_df(spark, N_DOCS).cache()


def test_crash_then_resume_no_dup_no_loss(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))

    with pytest.raises(RuntimeError, match="injected failure"):
        run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP,
                        fail_after_groups=1)

    store = SnapshotStore(root)
    partial = store.current_snapshot()
    assert partial["snapshot_id"] == 1
    assert len(partial["committed_buckets"]) == GROUP
    n_partial = store.read(spark).count()
    assert 0 < n_partial

    # resume: only uncommitted buckets are reprocessed
    snap = run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP)
    assert snap["committed_buckets"] == list(range(N_BUCKETS))

    clean = extract(docs)
    assert _rows(store.read(spark)) == _rows(clean)

    # resumed buckets carry the later attempt id in the lineage table
    attempts = {r["attempt"] for r in store.read_metrics(spark).collect()}
    assert attempts == {1, 2}


def test_orphans_invisible_and_replaced(spark, docs, tmp_path_factory):
    """Data files written by a crashed attempt (commit never happened)
    must be invisible to snapshot reads and replaced on retry."""
    root = str(tmp_path_factory.mktemp("store"))
    # crash AFTER group 0's data write but BEFORE its commit: orphan
    # parquet files exist under data/, the snapshot pointer does not
    with pytest.raises(RuntimeError, match="after write"):
        run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP,
                        fail_after_groups=0, fail_point="after_write")
    store = SnapshotStore(root)
    assert store.current_snapshot()["snapshot_id"] == 0
    assert store.read(spark).count() == 0  # orphans invisible

    run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP)
    assert _rows(store.read(spark)) == _rows(extract(docs))


def test_time_travel_read(spark, docs, tmp_path_factory):
    """Reading VERSION AS OF an earlier snapshot sees exactly the
    buckets committed then — later commits are invisible."""
    root = str(tmp_path_factory.mktemp("store"))
    run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP)
    store = SnapshotStore(root)
    snaps = store.current_snapshot()["snapshot_id"]
    assert snaps == N_BUCKETS // GROUP

    first = store.snapshot(1)
    assert first["committed_buckets"] == list(range(GROUP))
    early = store.read(spark, snapshot_id=1)
    full = store.read(spark)
    assert 0 < early.count() < full.count()
    got_buckets = {r["bucket"] for r in early.select("bucket").distinct().collect()}
    assert got_buckets <= set(first["committed_buckets"])

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.snapshot(99)


def test_rerun_is_noop(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP)
    s1 = SnapshotStore(root).current_snapshot()
    run_extract_job(spark, docs, root, n_buckets=N_BUCKETS, group_size=GROUP)
    s2 = SnapshotStore(root).current_snapshot()
    assert s1 == s2  # nothing left to do -> no new snapshot

    store = SnapshotStore(root)
    m = store.read_metrics(spark)
    assert m.count() == N_BUCKETS
    got = store.read(spark)
    docs_total = got.select("doc_id").distinct().count()
    assert sum(r["n_docs"] for r in m.collect()) == docs_total
