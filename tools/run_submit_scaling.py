"""N -> 4N executor scaling via LITERAL ``spark-submit --py-files``
launches -> BENCH/submit_scaling.json (+ a section in BENCH/BASELINE.md
at --regen time via run_scaling).

The in-process protocol (tools/run_scaling.py, tools/run_amortization.py
--exec-pairs) already measures local-cluster executor pairs, but boots
Spark through the pyspark launcher inside a python child. The north
rule's wording is "run via spark-submit --py-files on a multi-executor
cluster at two cluster sizes" — this harness is that sentence, verbatim:

- ``tools/make_pyfiles.py`` builds dist/ocr_spark.zip;
- ``jobs/bench_extract.py`` is copied to a SCRATCH directory and
  launched from there, so neither driver nor executors can import
  ocr_spark from the checkout — the ``--py-files`` zip is the only
  source (client-mode drivers get py-files on PYTHONPATH; executors get
  them shipped with the app);
- each run is one ``spark-submit --master local-cluster[n,4,4096]``
  process: a cold JVM AND cold executors per the protocol, with the
  128-doc warm-up inside the session excluded from the timed region;
- the amortized-regime corpus (48000 docs by default — the 6000-doc
  protocol corpus carries a ~10 s per-JOB serial term that understates
  any 4N config, see BENCH/NOTES_r4.md section 8; the multiplier
  tracks kernel speed, see run_amortization.py) and the same
  interleaved-reps/median protocol as every other timing artifact.

Usage: python tools/run_submit_scaling.py [--docs 48000] [--timed 3]
       [--pairs 1x4,4x4,2x4,8x4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from make_pyfiles import build_zip  # noqa: E402  (sibling tool module)

SPARK_SUBMIT = os.environ.get(
    "SPARK_SUBMIT", shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
)

CONFIGS = {
    "1x4": ("local-cluster[1,4,4096]", 4),
    "4x4": ("local-cluster[4,4,4096]", 16),
    "2x4": ("local-cluster[2,4,4096]", 8),
    "8x4": ("local-cluster[8,4,4096]", 32),
}


def _stage_corpus(docs: int) -> tuple[str, str]:
    from ocr_spark.plans.extract import corpus_df
    from ocr_spark.plans.session import build_session

    work = tempfile.mkdtemp(prefix="submit_scaling_")
    corpus = os.path.join(work, "corpus")
    spark = build_session(master="local[8]", app_name="submit_stage")
    spark.sparkContext.setLogLevel("ERROR")
    # same per-task row count as the main protocol (6000 docs / 64 parts)
    corpus_df(spark, docs, partitions=max(64, docs // 94)).write.parquet(corpus)
    spark.stop()
    return work, corpus


def submit_once(scratch: str, zip_path: str, corpus: str, out: str,
                master: str, cores: int) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "--py-files", zip_path,
        "--conf", "spark.ui.enabled=false",
        os.path.join(scratch, "bench_extract.py"),
        "--corpus", corpus,
        "--out", out,
        "--shuffle", str(2 * cores),
    ]
    p = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=scratch,
        env={**os.environ, "PYTHONPATH": ""},  # checkout must not leak in
    )
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=48000)
    ap.add_argument("--timed", type=int, default=3)
    ap.add_argument("--pairs", default="1x4,4x4,2x4,8x4",
                    help="comma list of CONFIGS keys, run interleaved in order")
    args = ap.parse_args()
    labels = args.pairs.split(",")

    zip_path = build_zip()
    work, corpus = _stage_corpus(args.docs)
    # scratch launch dir: only the job script and the zip live here
    scratch = os.path.join(work, "launch")
    os.makedirs(scratch)
    shutil.copy(os.path.join(REPO, "jobs", "bench_extract.py"), scratch)

    loadavg_start = os.getloadavg()
    walls: dict[str, list[float]] = {lbl: [] for lbl in labels}
    for rep in range(args.timed):
        for lbl in labels:
            master, cores = CONFIGS[lbl]
            r = submit_once(scratch, zip_path, corpus,
                            os.path.join(work, f"out_{lbl}"), master, cores)
            # a small fraction of docs legitimately emit no rows (all
            # text spans boilerplate-stripped, no media spans) — the
            # invariant gate accounts for them; here just sanity-bound
            assert 0.9 * args.docs <= r["n_docs_out"] <= args.docs, r
            walls[lbl].append(r["wall_s"])
            print(
                f"rep {rep + 1}/{args.timed} {lbl} ({master}): "
                f"{r['wall_s']:.1f}s "
                f"loadavg={tuple(round(x, 1) for x in os.getloadavg())}",
                flush=True,
            )
    loadavg_end = os.getloadavg()

    med = {lbl: statistics.median(walls[lbl]) for lbl in labels}
    payload = {
        "launcher": "spark-submit --py-files dist/ocr_spark.zip (client mode, "
        "scratch cwd, empty PYTHONPATH: the zip is the only package source)",
        "n_docs": args.docs,
        "results": {
            lbl: {
                "master": CONFIGS[lbl][0],
                "cores": CONFIGS[lbl][1],
                "walls_s": [round(w, 2) for w in walls[lbl]],
                "median_wall_s": round(med[lbl], 2),
                "docs_per_sec": round(args.docs / med[lbl], 2),
            }
            for lbl in labels
        },
        "protocol": f"{args.timed} timed spark-submit runs per config, "
        "INTERLEAVED across configs (cold JVM + cold executors each), "
        "in-session 128-doc warm-up excluded, medians",
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in loadavg_end],
    }
    if "1x4" in med and "4x4" in med:
        payload["exec_scaling_efficiency_1x4_to_4x4"] = round(
            med["1x4"] / med["4x4"] / 4, 3
        )
    if "2x4" in med and "8x4" in med:
        payload["exec_scaling_efficiency_2x4_to_8x4"] = round(
            med["2x4"] / med["8x4"] / 4, 3
        )
    out_path = os.path.join(REPO, "BENCH", "submit_scaling.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v for k, v in payload.items() if k != "results"}))


if __name__ == "__main__":
    main()
