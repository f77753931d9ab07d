"""Unit tests for tools/run_host_window.py's pure derivation.

The timed protocol itself is an operator-level measurement harness
(exercised for real when a window is recorded); what must never
regress silently is the ratio arithmetic the supplementary JSONs
carry — per-pair engine efficiency, the kernel hardware ceiling over
the same core step, and engine-vs-ceiling — since NOTES/BASELINE
quote those numbers verbatim."""

from __future__ import annotations

from tools.run_host_window import PAIRS, derive_pairs


def _res(dps: dict[str, tuple[int, float]]) -> dict[str, dict]:
    return {k: {"cpus": c, "docs_per_sec": v} for k, (c, v) in dps.items()}


def test_perfect_scaling_reads_eff_1() -> None:
    results = _res(
        {
            "local[4]": (4, 100.0),
            "local[16]": (16, 400.0),
        }
    )
    ceil = {4: 1000.0, 16: 4000.0}
    (p,) = derive_pairs(results, ceil)
    assert p["pair"] == "local 4 -> 16"
    assert p["eff"] == 1.0
    assert p["hw_ceiling"] == 1.0
    assert p["engine_vs_ceiling"] == 1.0


def test_hardware_droop_divides_out() -> None:
    # engine delivers 0.75 raw over 8 -> 32, but the box itself only
    # delivers 0.797 of the core step: engine contribution ~0.941
    results = _res(
        {
            "local[8]": (8, 200.0),
            "local[32]": (32, 600.0),
        }
    )
    ceil = {8: 5383.1, 32: 17165.0}
    (p,) = derive_pairs(results, ceil)
    assert p["eff"] == 0.75
    assert p["hw_ceiling"] == 0.797
    assert p["engine_vs_ceiling"] == round(0.75 / 0.797, 3)


def test_missing_configs_are_skipped_not_fatal() -> None:
    results = _res({"local[4]": (4, 100.0), "local[16]": (16, 350.0)})
    ceil = {4: 1000.0, 8: 1900.0, 16: 3800.0, 32: 7000.0}
    pairs = derive_pairs(results, ceil)
    assert [p["pair"] for p in pairs] == ["local 4 -> 16"]
    assert pairs[0]["eff"] == round(3.5 / 4, 3)


def test_pairs_table_is_n_to_4n_only() -> None:
    # every configured pair steps cores by exactly 4x — the north
    # rule's N -> 4N shape
    label_cpus = {
        "local[4]": 4,
        "local[8]": 8,
        "local[16]": 16,
        "local[32]": 32,
        "cluster-1x4": 4,
        "cluster-2x4": 8,
        "cluster-4x4": 16,
        "cluster-8x4": 32,
    }
    for small, large, _ in PAIRS:
        assert label_cpus[large] == 4 * label_cpus[small]
