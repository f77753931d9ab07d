"""Fixed-cost amortization evidence -> BENCH/amortization.json.

The full protocol's Amdahl decomposition (BENCH/NOTES_r4.md) shows a
~10 s per-JOB serial component (driver planning, the bounded stats
sample, parquet commit) that perfectly explains the same-box raw
scaling knee at 6000 documents: wall(c) ~= s + W/c with s ~= 10 s,
W ~= 300 core-seconds. That term is a sandbox artifact of SHORT jobs
— a production run is hours long and amortizes it to zero — so this
harness re-measures the four local[] configs on a scaled-up corpus,
where the same engine and the same plan should read raw 4 -> 16
efficiency near the amortized limit. Protocol is identical to
run_scaling.py (cold JVM per run, warm-up excluded, 3 timed reps
INTERLEAVED across configs, medians); run_scaling's --regen folds the
result into BENCH/BASELINE.md as its own section.

The corpus multiplier tracks the KERNEL, not a fixed doc count:
"amortized" is a wall-time statement (per-job serial seconds vs
parallel work seconds), so every time the recognition kernel gets
faster the corpus must grow proportionally to keep the serial term
the same small fraction of the wall. 24000 docs amortized the
round-4 mid-round kernel; the late-round slab/pool/recurrence push
(~2x) moved the default to 48000.

Usage: python tools/run_amortization.py [--docs 48000] [--timed 3]

``--exec-pairs`` measures the north rule's LITERAL form in the
amortized regime instead: N vs 4N EXECUTORS (local-cluster masters,
real separate executor JVMs at 4 cores each — 1x4 -> 4x4 and
2x4 -> 8x4) on the same amortized corpus, and MERGES the results into the
existing BENCH/amortization.json (the local[] block keeps its own
measurement window; each efficiency ratio is computed strictly within
one window, which is the portable quantity on this co-tenant box).
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


def _stage_corpus(docs: int) -> tuple[str, str]:
    from ocr_spark.plans.extract import corpus_df
    from ocr_spark.plans.session import build_session

    work = tempfile.mkdtemp(prefix="amort_")
    corpus = os.path.join(work, "corpus")
    out = os.path.join(work, "out")
    spark = build_session(master="local[8]", app_name="amort_stage")
    spark.sparkContext.setLogLevel("ERROR")
    # partitions scale with the corpus so per-task row counts match
    # the main protocol's (6000 docs / 64 partitions)
    corpus_df(spark, docs, partitions=max(64, docs // 94)).write.parquet(corpus)
    spark.stop()
    return corpus, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=48000)
    ap.add_argument("--timed", type=int, default=3)
    ap.add_argument(
        "--exec-pairs",
        action="store_true",
        help="measure N -> 4N EXECUTOR pairs (local-cluster, separate "
        "executor JVMs, 4 cores each) and merge into the existing "
        "BENCH/amortization.json instead of re-measuring the local[] block",
    )
    args = ap.parse_args()

    amort_path = os.path.join(REPO, "BENCH", "amortization.json")

    if args.exec_pairs:
        # the north rule's literal form (N vs 4N executors) in the
        # amortized regime; the cluster configs spawn real separate
        # executor JVMs with their own python workers.  --docs may
        # exceed the local[] block's: executor JVMs carry a LARGER
        # per-job fixed cost (JVM boot, worker daemons, executor
        # registration) than in-process local[] threads, so by the
        # corpus-tracks-the-kernel doctrine this form needs a longer
        # wall to amortize the same fraction; exec_n_docs records it.
        configs = [
            ("cluster-1x4", 4, "local-cluster[1,4,4096]"),
            ("cluster-4x4", 16, "local-cluster[4,4,4096]"),
            ("cluster-2x4", 8, "local-cluster[2,4,4096]"),
            ("cluster-8x4", 32, "local-cluster[8,4,4096]"),
        ]
        with open(amort_path) as f:
            payload = json.load(f)
        payload["exec_n_docs"] = args.docs
        corpus, out = _stage_corpus(args.docs)
        loadavg_start = os.getloadavg()
        walls: dict[str, list[float]] = {lbl: [] for lbl, _, _ in configs}
        for rep in range(args.timed):
            for lbl, cpus, master in configs:
                r = run_once(corpus, out, cpus, master=master)
                walls[lbl].append(r["wall_s"])
                print(
                    f"rep {rep + 1}/{args.timed} {lbl}: {r['wall_s']:.1f}s "
                    f"loadavg={tuple(round(x, 1) for x in os.getloadavg())}",
                    flush=True,
                )
        loadavg_end = os.getloadavg()
        payload["exec_results"] = {
            lbl: {
                "cpus": cpus,
                "master": master,
                "walls_s": [round(w, 2) for w in walls[lbl]],
                "median_wall_s": round(statistics.median(walls[lbl]), 2),
                "docs_per_sec": round(
                    args.docs / statistics.median(walls[lbl]), 2
                ),
            }
            for lbl, cpus, master in configs
        }
        med = {lbl: statistics.median(walls[lbl]) for lbl, _, _ in configs}
        payload["exec_scaling_efficiency_1x4_to_4x4"] = round(
            med["cluster-1x4"] / med["cluster-4x4"] / 4, 3
        )
        payload["exec_scaling_efficiency_2x4_to_8x4"] = round(
            med["cluster-2x4"] / med["cluster-8x4"] / 4, 3
        )
        payload["exec_protocol"] = (
            "N -> 4N EXECUTORS (local-cluster, separate executor JVMs, "
            f"4 cores each), {args.timed} interleaved timed reps, medians, "
            f"{args.docs / 6000:g}x corpus ({args.docs} docs); measured in "
            "its OWN window (ratios are within-window)"
        )
        payload["exec_loadavg_start"] = [round(x, 2) for x in loadavg_start]
        payload["exec_loadavg_end"] = [round(x, 2) for x in loadavg_end]
        with open(amort_path, "w") as f:
            json.dump(payload, f, indent=2)
        print(
            json.dumps(
                {k: v for k, v in payload.items() if "results" not in k}
            )
        )
        return

    corpus, out = _stage_corpus(args.docs)
    cpus_list = [4, 8, 16, 32]
    loadavg_start = os.getloadavg()
    walls_c: dict[int, list[float]] = {c: [] for c in cpus_list}
    for rep in range(args.timed):
        for c in cpus_list:
            r = run_once(corpus, out, c)
            walls_c[c].append(r["wall_s"])
            print(
                f"rep {rep + 1}/{args.timed} local[{c}]: {r['wall_s']:.1f}s "
                f"loadavg={tuple(round(x, 1) for x in os.getloadavg())}",
                flush=True,
            )
    loadavg_end = os.getloadavg()

    results = {
        f"local[{c}]": {
            "cpus": c,
            "walls_s": [round(w, 2) for w in walls_c[c]],
            "median_wall_s": round(statistics.median(walls_c[c]), 2),
            "docs_per_sec": round(args.docs / statistics.median(walls_c[c]), 2),
        }
        for c in cpus_list
    }
    med = {c: statistics.median(walls_c[c]) for c in cpus_list}
    payload = {
        "n_docs": args.docs,
        "results": results,
        "scaling_efficiency_4_to_16": round(med[4] / med[16] / 4, 3),
        "scaling_efficiency_8_to_32": round(med[8] / med[32] / 4, 3),
        "protocol": "identical to run_scaling.py (cold JVM, warm-up "
        f"excluded, {args.timed} interleaved timed reps, medians) at a "
        f"{args.docs / 6000:g}x corpus so the ~10 s per-job serial term "
        "amortizes (corpus multiplier tracks kernel speed: amortization "
        "is a wall-time property)",
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in loadavg_end],
    }
    with open(amort_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v for k, v in payload.items() if k != "results"}))


if __name__ == "__main__":
    main()
