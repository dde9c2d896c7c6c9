#!/usr/bin/env python
"""North-rule scaling evidence: same job, same input, N vs 4N cores.

No real cluster exists in this sandbox, so (per BASELINE.md) the two
"cluster sizes" are ``local[8]`` and ``local[32]`` — fresh JVMs via
subprocess so executor-thread counts and shuffle partitioning are really
different. Writes BENCH/BASELINE.md with turns/sec at both sizes and the
scaling efficiency throughput(4N) / (4 × throughput(N)).

Usage: python scripts/scaling_bench.py [--sf-dir DIR] [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_once(cpus: int, sf_dir: str, n_conv: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_DRIVER_MEM="48g")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--only", "kg_pipeline",
         "--cpus", str(cpus), "--n-conv", str(n_conv), "--warmup"],
        env=env, capture_output=True, text=True, check=True,
    )
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=1)
    # large enough that parallel compute dominates fixed per-job overhead —
    # scaling measurements on tiny inputs measure scheduler latency, not
    # the pipeline (Amdahl: driver-side fixed cost ~8s amortizes at scale)
    ap.add_argument("--n-conv", type=int, default=1_200_000)
    args = ap.parse_args()

    results: dict[int, dict] = {}
    for cpus in (8, 32):
        best = None
        for _ in range(args.repeats):
            r = run_once(cpus, args.sf_dir, args.n_conv)
            if best is None or r["turns_per_sec"] > best["turns_per_sec"]:
                best = r
        results[cpus] = best

    tp8 = results[8]["turns_per_sec"]
    tp32 = results[32]["turns_per_sec"]
    eff = round(tp32 / (4 * tp8), 3)
    n_turns = results[32]["n_turns"]

    md = f"""# BENCH — scaling evidence (north rule)

KG-construction pipeline (`build_kg`: stable ordering → salted repartition →
mention/relation pandas UDFs → entity linking → MinHash/LSH + CC
canonicalization → canonical rewrite → dedup → N-Triples render), same
deterministic synthetic transcript corpus ({n_turns:,} turns incl. 1% hot
conversations), same input, two parallelism levels in fresh JVMs
(no real cluster in this sandbox — `local[8]` vs `local[32]` per BASELINE.md).

| parallelism | wall (s) | turns/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['queries']['kg_pipeline']} | {tp8:,} |
| local[32] (4N) | {results[32]['queries']['kg_pipeline']} | {tp32:,} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) = {eff}**
(target >= 0.8; best of {args.repeats} runs per size)

Reference envelope (BASELINE.md): the reference's pulse throttle caps it at
~66.7 datasets/sec on 1 CPU, strictly sequential per catalogue.
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md)
    print(json.dumps({
        "turns_per_sec_8": tp8, "turns_per_sec_32": tp32,
        "scaling_efficiency": eff, "n_turns": n_turns,
    }))


if __name__ == "__main__":
    main()
