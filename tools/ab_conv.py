"""A/B the conv form under real extraction load.

Cold JVM per run (subprocess), OCR_SPARK_CONV in the child env so the
forked python workers see it. Interleaved A/B order so co-tenant drift
hits both arms equally — the r3 lesson: kernel-shape changes MUST be
measured at fleet concurrency, single-worker sweeps invert.

Usage: python tools/ab_conv.py [--docs 6000] [--reps 3] [--cpus 32]
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
spark = build_session(master='local[{cpus}]', app_name='ab_conv')
spark.sparkContext.setLogLevel('ERROR')
docs = spark.read.parquet({corpus!r})
extract(docs.limit(128)).write.mode('overwrite').parquet({out!r} + '_warm')
t0 = time.time()
extract(docs).write.mode('overwrite').parquet({out!r})
print(json.dumps({{"wall_s": time.time() - t0}}))
spark.stop()
"""


def run_once(corpus: str, out: str, cpus: int, conv: str) -> float:
    env = dict(os.environ, OCR_SPARK_CONV=conv)
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
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--convs", default="shiftsum,im2col")
    args = ap.parse_args()

    from ocr_spark.plans.extract import corpus_df
    from ocr_spark.plans.session import build_session

    print("loadavg:", os.getloadavg(), flush=True)
    work = tempfile.mkdtemp(prefix="ab_conv_")
    corpus = os.path.join(work, "corpus")
    out = os.path.join(work, "out")
    spark = build_session(master="local[8]", app_name="ab_stage")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df(spark, args.docs, partitions=64).write.parquet(corpus)
    spark.stop()

    heads = args.convs.split(",")
    results: dict[str, list[float]] = {}
    for cpus in [int(c) for c in args.cpus.split(",")]:
        for _ in range(args.reps):
            for conv in heads:  # interleaved
                w = run_once(corpus, out, cpus, conv)
                results.setdefault(f"local[{cpus}] conv={conv}", []).append(w)
                print(f"local[{cpus}] conv={conv}: {w:.1f}s", flush=True)
    print("loadavg:", os.getloadavg(), flush=True)
    print(json.dumps(
        {k: round(statistics.median(v), 2) for k, v in results.items()}
    ))


if __name__ == "__main__":
    main()
