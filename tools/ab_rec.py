"""A/B the recurrence batch width under real extraction load.

The diagonal recurrence is numpy-dispatch-bound per step; batching B
same-width crops into one [2, B, D] state amortizes dispatch B-fold
(crnn.forward_probs_batch). Conv/head stacking stays OFF in every arm
(OCR_SPARK_MAX_CROPS=1 — the r4 fleet A/B showed stacking those loses).

Cold JVM per run (subprocess), OCR_SPARK_REC_BATCH in the child env so
the forked python workers see it. Interleaved A/B order so co-tenant
drift hits both arms equally; decode stays bit-identical (fixtures).

Usage: python tools/ab_rec.py [--docs 6000] [--reps 3] [--widths 1,64]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ocr_spark.plans.session import build_session
from ocr_spark.plans.extract import extract
spark = build_session(master='local[{cpus}]', app_name='ab_rec')
spark.sparkContext.setLogLevel('ERROR')
docs = spark.read.parquet({corpus!r})
extract(docs.limit(128)).write.mode('overwrite').parquet({out!r} + '_warm')
t0 = time.time()
extract(docs).write.mode('overwrite').parquet({out!r})
print(json.dumps({{"wall_s": time.time() - t0}}))
spark.stop()
"""


def run_once(corpus: str, out: str, cpus: int, rec_batch: int) -> float:
    env = dict(
        os.environ,
        OCR_SPARK_REC_BATCH=str(rec_batch),
        OCR_SPARK_MAX_CROPS="1",
    )
    code = CHILD.format(repo=REPO, cpus=cpus, corpus=corpus, out=out)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True, env=env,
    )
    return json.loads(p.stdout.strip().splitlines()[-1])["wall_s"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--widths", default="1,16,64,256")
    args = ap.parse_args()

    from ocr_spark.plans.extract import corpus_df
    from ocr_spark.plans.session import build_session

    work = tempfile.mkdtemp(prefix="ab_rec_")
    corpus = os.path.join(work, "corpus")
    spark = build_session(master="local[8]", app_name="ab_rec_stage")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df(spark, args.docs, partitions=64).write.parquet(corpus)
    spark.stop()

    widths = [int(w) for w in args.widths.split(",")]
    walls: dict[int, list[float]] = {w: [] for w in widths}
    for rep in range(args.reps):
        for w in widths:
            wall = run_once(corpus, os.path.join(work, f"out_{w}"), args.cpus, w)
            walls[w].append(wall)
            print(
                f"rep {rep + 1}/{args.reps} rec_batch={w}: {wall:.1f}s "
                f"loadavg={tuple(round(x, 1) for x in os.getloadavg())}",
                flush=True,
            )
    print(
        json.dumps(
            {
                str(w): {
                    "walls": [round(x, 2) for x in ws],
                    "median": round(statistics.median(ws), 2),
                }
                for w, ws in walls.items()
            }
        )
    )


if __name__ == "__main__":
    main()
