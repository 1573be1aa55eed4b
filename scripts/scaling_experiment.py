#!/usr/bin/env python
"""A/B config experiment for the round-6 scaling fix, at the 9,600-doc
corpus (fast iterations before re-measuring the 38,400-doc criterion).

Round-6 diagnosis (scripts/scaling_diag16.py at 38,400 docs):
  * jvmGcTime is NOT the collapse (274 s of ~8,400 core-s at 16c);
  * total executorRunTime inflates 5,715 -> 7,800 s at 4c -> 16c, of
    which ~1,044 s is REAL JVM CPU growth that tracks the 3.8x task
    count (414 -> 1,584 — every partition count scales with cores), and
    ~660 s is the heaviest python geometry stage running ~28% slower
    under 16-way concurrency (memory-allocation churn: the fixed
    alloc-churn probe shows aggregate throughput FALLING from 4 -> 16
    procs on this box while true streaming bandwidth is flat).

Variants:
  base   — cores-proportional partitions (round-5 behaviour)
  pinned — DATA-proportional partitions: the same task list at both
           parallelism levels (shuffle=32, kernel=64 — the 16c values),
           the sizing a 100 TB deployment uses anyway (partitions follow
           data; a bigger cluster runs the same tasks in fewer waves)
  malloc — pinned + MALLOC_MMAP_THRESHOLD_/TRIM 256 MB (python workers
           stop munmap/re-faulting large numpy buffers per batch) +
           Arrow batch 8192 (fewer pandas-DataFrame constructions)

Usage: python scripts/scaling_experiment.py [sf] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import _pin, REPO  # noqa: E402
from run_scaling16 import RUNNER  # noqa: E402

VARIANTS = {
    "base": {},
    "pinned": {
        "SPARK_GRAFT_SHUFFLE_PARTITIONS": "32",
        "SPARK_GRAFT_KERNEL_PARTITIONS": "64",
    },
    "malloc": {
        "SPARK_GRAFT_SHUFFLE_PARTITIONS": "32",
        "SPARK_GRAFT_KERNEL_PARTITIONS": "64",
        "MALLOC_MMAP_THRESHOLD_": "268435456",
        "MALLOC_TRIM_THRESHOLD_": "268435456",
        "SPARK_GRAFT_ARROW_BATCH": "8192",
    },
}


def run_once(cores: int, sf: str, extra_env: dict) -> float:
    code = RUNNER.format(repo=REPO, cores=cores, sf=sf)
    errpath = f"/tmp/scalexp_{cores}c.err"
    with open(errpath, "w") as errf:
        out = subprocess.run(
            _pin(cores) + [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=errf, text=True, timeout=14000,
            env={**os.environ, "SPARK_DRIVER_MEM": "32g", **extra_env})
    for line in out.stdout.splitlines():
        if line.startswith("TIMES "):
            return json.loads(line[6:])["times"][0]
    raise RuntimeError(f"no TIMES at {cores}c; see {errpath}: "
                       f"{open(errpath).read()[-800:]}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf_scale_4x"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    results: dict[str, dict[str, list[float]]] = {
        v: {"4": [], "16": []} for v in VARIANTS}
    for r in range(rounds):
        for name, env in VARIANTS.items():
            t4 = run_once(4, sf, env)
            t16 = run_once(16, sf, env)
            results[name]["4"].append(t4)
            results[name]["16"].append(t16)
            eff = (t4 / t16) / 4.0
            print(f"[round {r}] {name}: 4c {t4:.1f}s  16c {t16:.1f}s  "
                  f"raw eff {eff:.3f}", flush=True)
            with open(f"/tmp/scalexp_{sf}.json", "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
