"""Per-stage strong-scaling breakdown of the index build.

Runs ONE warm-up + ONE timed build at each core level and prints the
wall time of each pipeline stage, so a sub-0.8 end-to-end efficiency
can be attributed: which stage stops scaling — tokenize/doc-table
(Arrow UDF), corpus stats (1-row agg), postings shuffle+encode, or the
dictionary agg?

Usage: python scripts/stage_breakdown.py [n_docs] [levels "2,8"]
Prints one JSON line per level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); input_path = sys.argv[2]
from mario_spark.session import get_spark
from mario_spark import docs
from mario_spark.postings import build_postings
PARTS = 32  # fixed decomposition across levels — see scaling_bench.py
spark = get_spark("stage", master=f"local[{{cores}}]", shuffle_partitions=PARTS,
                  extra_conf={{
                      "spark.driver.extraJavaOptions":
                          f"-XX:ActiveProcessorCount={{cores}}",
                      "spark.default.parallelism": str(PARTS),
                      "spark.sql.adaptive.coalescePartitions.enabled": "false",
                  }})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(input_path).repartition(PARTS).persist()
pages.count()

def build(timings=None):
    t = time.perf_counter
    t0 = t()
    d = docs.build_doc_table(pages).persist()
    n = d.count()                      # materialize doc table alone
    t1 = t()
    st = docs.corpus_stats(d).collect()[0]
    t2 = t()
    post, dic, rw = build_postings(d, st["n_docs"])
    post = post.persist()
    blocks = post.count()              # shuffle + encode
    t3 = t()
    dic.count()
    t4 = t()
    if timings is not None:
        timings.update(doc_table=round(t1 - t0, 2), stats=round(t2 - t1, 2),
                       postings=round(t3 - t2, 2), dictionary=round(t4 - t3, 2),
                       total=round(t4 - t0, 2), blocks=blocks, n_docs=n)
    d.unpersist(); post.unpersist()

build()          # warm-up, discarded
tm = {{}}
build(tm)
tm["cores"] = cores
print(json.dumps(tm))
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    levels = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "2,8").split(",")]
    input_path = f"/tmp/scaling_pages_{n_docs}"
    sys.path.insert(0, str(REPO / "scripts"))
    from scaling_bench import _pin  # same container-faithful CPU pin

    env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    for cores in levels:
        out = subprocess.run(
            _pin(cores)
            + [sys.executable, "-c", _CHILD.format(repo=str(REPO)),
               str(cores), input_path],
            capture_output=True, text=True, timeout=3000, env=env,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(lines[-1] if lines else out.stderr[-1500:])


if __name__ == "__main__":
    main()
