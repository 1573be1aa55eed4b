"""Kill-and-resume proof for the checkpointed pipeline (north_rule
resumability, demonstrated not asserted).

Protocol:
  1. RUN A (uninterrupted): run_checkpointed over $SPARK_GRAFT_SF_DIR
     into <out>/a, hash every output table.
  2. RUN B (killed): the same job into <out>/b launched as a child
     process that is SIGKILLed as soon as the first stage snapshot's
     manifest lands — a real mid-run kill, not a simulated one.
  3. RESUME B: rerun the same command; completed snapshots are reused
     (their manifests carry the fingerprint), the rest recompute.
  4. Compare order-insensitive DuckDB hashes of every table. Identical
     hashes = the resumed run converged to the uninterrupted output.

Prints ONE JSON line {"match": true, "hashes_a": ..., "hashes_b": ...,
"killed_after_stage": ...}.

Usage: PYTHONPATH=. python scripts/resume_proof.py [out_root]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = """
import os, sys
sys.path.insert(0, ".")
from osm2streets_spark.session import get_spark
from osm2streets_spark.plans.checkpointed import run_checkpointed

from osm2streets_spark.sources.fixtures import fixture_dir_for
from osm2streets_spark.plans.pipeline import load_documents

spark = get_spark("resume-proof-child", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None)
spark.sparkContext.setLogLevel("ERROR")
docs = load_documents(spark, fixture_dir_for(os.environ["RP_SF_DIR"]))
run_checkpointed(spark, docs, os.environ["RP_OUT"], fingerprint="rp1")
print("CHILD-DONE", flush=True)
"""


def table_hashes(out_root: str) -> dict:
    """Order-insensitive content hash per snapshot table via DuckDB."""
    import duckdb

    hashes = {}
    for stage in ("roads", "intersections", "features"):
        p = os.path.join(out_root, stage)
        row = duckdb.sql(
            f"select count(*), "
            f"sum(hash(to_json(t))::hugeint) "
            f"from read_parquet('{p}/*.parquet') t"
        ).fetchone()
        hashes[stage] = f"{row[0]}:{row[1]}"
    return hashes


def run_to_completion(out_root: str) -> None:
    env = dict(os.environ, RP_SF_DIR=SF_DIR, RP_OUT=out_root)
    subprocess.run([sys.executable, "-c", _CHILD], env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def run_and_kill(out_root: str) -> str:
    """Start the job, SIGKILL it the moment the first manifest lands."""
    env = dict(os.environ, RP_SF_DIR=SF_DIR, RP_OUT=out_root)
    proc = subprocess.Popen([sys.executable, "-c", _CHILD], env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    killed_after = None
    try:
        while proc.poll() is None:
            for stage in ("roads", "intersections", "features"):
                mp = os.path.join(out_root, stage, "_manifest.json")
                if os.path.exists(mp):
                    killed_after = stage
                    break
            if killed_after:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
            time.sleep(0.3)
    finally:
        if proc.poll() is None:
            proc.kill()
    if killed_after is None:
        raise SystemExit("job finished before any snapshot landed — "
                         "nothing was interrupted; rerun on a bigger SF")
    return killed_after


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/resume_proof"
    a, b = os.path.join(out, "a"), os.path.join(out, "b")
    for d in (a, b):
        subprocess.run(["rm", "-rf", d], check=True)

    run_to_completion(a)
    ha = table_hashes(a)

    killed_after = run_and_kill(b)
    run_to_completion(b)  # resume
    hb = table_hashes(b)

    print(json.dumps({
        "match": ha == hb,
        "killed_after_stage": killed_after,
        "sf_dir": SF_DIR,
        "hashes_a": ha,
        "hashes_b": hb,
    }))
    if ha != hb:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
