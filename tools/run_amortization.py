"""Fixed-cost amortization evidence -> BENCH/amortization.json.

The full protocol's Amdahl decomposition (BENCH/NOTES_r4.md) shows a
~10 s per-JOB serial component (driver planning, the bounded stats
sample, parquet commit) that perfectly explains the same-box raw
scaling knee at 6000 documents: wall(c) ~= s + W/c with s ~= 10 s,
W ~= 300 core-seconds. That term is a sandbox artifact of SHORT jobs
— a production run is hours long and amortizes it to zero — so this
harness re-measures the four local[] configs on a 4x corpus (24000
docs), where the same engine and the same plan should read raw
4 -> 16 efficiency near the amortized limit. Protocol is identical
to run_scaling.py (cold JVM per run, warm-up excluded, 3 timed reps
INTERLEAVED across configs, medians); run_scaling's --regen folds the
result into BENCH/BASELINE.md as its own section.

Usage: python tools/run_amortization.py [--docs 24000] [--timed 3]
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

from run_scaling import run_once  # noqa: E402  (sibling tool module)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=24000)
    ap.add_argument("--timed", type=int, default=3)
    args = ap.parse_args()

    from ocr_spark.plans.extract import corpus_df
    from ocr_spark.plans.session import build_session

    work = tempfile.mkdtemp(prefix="amort_")
    corpus = os.path.join(work, "corpus")
    out = os.path.join(work, "out")
    spark = build_session(master="local[8]", app_name="amort_stage")
    spark.sparkContext.setLogLevel("ERROR")
    # partitions scale with the corpus so per-task row counts match
    # the main protocol's (6000 docs / 64 partitions)
    corpus_df(spark, args.docs, partitions=max(64, args.docs // 94)).write.parquet(
        corpus
    )
    spark.stop()

    cpus_list = [4, 8, 16, 32]
    loadavg_start = os.getloadavg()
    walls: dict[int, list[float]] = {c: [] for c in cpus_list}
    for rep in range(args.timed):
        for c in cpus_list:
            r = run_once(corpus, out, c)
            walls[c].append(r["wall_s"])
            print(
                f"rep {rep + 1}/{args.timed} local[{c}]: {r['wall_s']:.1f}s "
                f"loadavg={tuple(round(x, 1) for x in os.getloadavg())}",
                flush=True,
            )
    loadavg_end = os.getloadavg()

    results = {
        f"local[{c}]": {
            "cpus": c,
            "walls_s": [round(w, 2) for w in walls[c]],
            "median_wall_s": round(statistics.median(walls[c]), 2),
            "docs_per_sec": round(args.docs / statistics.median(walls[c]), 2),
        }
        for c in cpus_list
    }
    med = {c: statistics.median(walls[c]) for c in cpus_list}
    payload = {
        "n_docs": args.docs,
        "results": results,
        "scaling_efficiency_4_to_16": round(med[4] / med[16] / 4, 3),
        "scaling_efficiency_8_to_32": round(med[8] / med[32] / 4, 3),
        "protocol": "identical to run_scaling.py (cold JVM, warm-up "
        f"excluded, {args.timed} interleaved timed reps, medians) at a "
        "4x corpus so the ~10 s per-job serial term amortizes",
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in loadavg_end],
    }
    with open(os.path.join(REPO, "BENCH", "amortization.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v for k, v in payload.items() if k != "results"}))


if __name__ == "__main__":
    main()
