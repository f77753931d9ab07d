"""Standalone single-host scaling window -> a supplementary JSON.

The evidence-of-record artifacts (BENCH/scaling.json,
BENCH/amortization.json) each hold ratios measured within ONE host
window; this sandbox reassigns hosts between sessions, so fresh
measurements on a new instance must NEVER be merged into them (a
ratio across two hosts measures the host swap, not the engine). This
tool runs the amortized local[] ladder plus the N -> 4N executor-JVM
pairs (local-cluster masters, 4 cores per executor) as one
interleaved window on the CURRENT host and writes a self-contained
supplementary JSON — the BENCH/NOTES_r5.md §11/§15 pattern — with the
no-Spark kernel ceiling probed in the SAME window so the engine's
ratios can be read against what the box physically delivers.

Usage:
    python tools/run_host_window.py --docs 32000 --timed 3 \\
        --out BENCH/scaling_r5_hostN.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.run_scaling import kernel_ceiling, run_once  # noqa: E402

CONFIGS = [
    # (label, cores, master) — local[] ladder + executor-JVM pairs at
    # equal cores-per-executor; each N -> 4N ratio is computed within
    # this one window
    ("local[4]", 4, None),
    ("local[8]", 8, None),
    ("local[16]", 16, None),
    ("local[32]", 32, None),
    ("cluster-1x4", 4, "local-cluster[1,4,4096]"),
    ("cluster-2x4", 8, "local-cluster[2,4,4096]"),
    ("cluster-4x4", 16, "local-cluster[4,4,4096]"),
    ("cluster-8x4", 32, "local-cluster[8,4,4096]"),
]

PAIRS = [
    ("local[4]", "local[16]", "local 4 -> 16"),
    ("local[8]", "local[32]", "local 8 -> 32"),
    ("cluster-1x4", "cluster-4x4", "1x4 -> 4x4 executor JVMs"),
    ("cluster-2x4", "cluster-8x4", "2x4 -> 8x4 executor JVMs"),
]


def derive_pairs(
    results: dict[str, dict], ceil: dict[int, float]
) -> list[dict]:
    """Pure derivation: per-pair engine efficiency, the kernel
    hardware ceiling over the same core step, and their ratio (the
    engine's own contribution with the box's core-delivery droop
    divided out)."""
    pairs = []
    for small, large, desc in PAIRS:
        if small not in results or large not in results:
            continue
        eff = round(
            (results[large]["docs_per_sec"] / results[small]["docs_per_sec"])
            / 4,
            3,
        )
        hw = round(
            ceil[results[large]["cpus"]] / ceil[results[small]["cpus"]] / 4, 3
        )
        pairs.append(
            {
                "pair": desc,
                "small": small,
                "large": large,
                "eff": eff,
                "hw_ceiling": hw,
                "engine_vs_ceiling": round(eff / hw, 3),
            }
        )
    return pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=32000)
    ap.add_argument("--timed", type=int, default=3)
    ap.add_argument("--out", default="BENCH/scaling_window.json")
    args = ap.parse_args()

    from ocr_spark.plans.extract import corpus_df
    from ocr_spark.plans.session import build_session

    work = tempfile.mkdtemp(prefix="hostwin_")
    corpus = os.path.join(work, "corpus")
    out = os.path.join(work, "out")
    spark = build_session(master="local[8]", app_name="hostwin_stage")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df(spark, args.docs, partitions=max(64, args.docs // 94)).write.parquet(
        corpus
    )
    spark.stop()

    loadavg_start = os.getloadavg()
    walls: dict[str, list[float]] = {}
    for rep in range(args.timed):
        for label, cpus, master in CONFIGS:
            r = run_once(corpus, out, cpus, master=master)
            walls.setdefault(label, []).append(r["wall_s"])
            print(
                f"rep {rep + 1}/{args.timed} {label}: {r['wall_s']:.1f}s "
                f"loadavg={tuple(round(x, 1) for x in os.getloadavg())}",
                flush=True,
            )
    loadavg_mid = os.getloadavg()
    ceil = kernel_ceiling()
    loadavg_end = os.getloadavg()

    results = {}
    for label, cpus, master in CONFIGS:
        med = statistics.median(walls[label])
        results[label] = {
            "cpus": cpus,
            "master": master or f"local[{cpus}]",
            "walls_s": [round(w, 2) for w in walls[label]],
            "median_wall_s": round(med, 2),
            "docs_per_sec": round(args.docs / med, 2),
        }
    pairs = derive_pairs(results, ceil)

    payload = {
        "n_docs": args.docs,
        "protocol": "cold JVM per run, in-session 128-doc warm-up "
        f"excluded, {args.timed} timed reps INTERLEAVED across configs, "
        "medians; kernel ceiling probed in the same window",
        "results": results,
        "pairs": pairs,
        "kernel_ceiling_agg_crops_per_s": {str(k): v for k, v in ceil.items()},
        "target": 0.8,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_mid": [round(x, 2) for x in loadavg_mid],
        "loadavg_end": [round(x, 2) for x in loadavg_end],
    }
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"out": args.out, "pairs": pairs}))


if __name__ == "__main__":
    main()
