#!/usr/bin/env python
"""Per-query bench regression tripwire (round-8, VERDICT r7 ask #7).

Compares two bench.py artifacts (the JSON line each round's driver
saves as BENCH_r{N}.json) and flags any query whose median regressed
more than THRESHOLD (default 25%) round-over-round — so a
flagship-focused optimization can't silently tax the other queries
again (r6→r7: dd_minhash_lsh +54%, sim_ann_topk +69%, ta_fingerprint
+43% driver-to-driver went unmentioned until the judge measured them).

Load awareness: each artifact carries run_loads ([loadavg-before,
loadavg-after, box-busy-fraction] per timed run, bench.py round-4
protocol). If the newer artifact's median busy-fraction for a query is
more than LOAD_DELTA higher than the older one's, the comparison is
marked "load-confounded" instead of "REGRESSED" — a loaded box is not
an engine regression (but still printed, never silently dropped).

Usage: python scripts/bench_tripwire.py OLD.json NEW.json [threshold]
Exit code 1 if any un-confounded regression fired.
"""

from __future__ import annotations

import json
import statistics
import sys

THRESHOLD = 0.25
LOAD_DELTA = 0.25


def _busy(artifact: dict, q: str) -> float | None:
    loads = (artifact.get("run_loads") or {}).get(q)
    if not loads:
        return None
    return statistics.median(r[2] for r in loads if len(r) >= 3)


def compare(old: dict, new: dict, threshold: float = THRESHOLD) -> list[dict]:
    """Returns one record per query present in both artifacts."""
    out = []
    for q, t_old in (old.get("queries") or {}).items():
        t_new = (new.get("queries") or {}).get(q)
        if t_new is None or not t_old:
            continue
        ratio = t_new / t_old
        rec = {"query": q, "old": t_old, "new": t_new,
               "ratio": round(ratio, 3)}
        if ratio > 1 + threshold:
            b_old, b_new = _busy(old, q), _busy(new, q)
            confounded = (b_old is not None and b_new is not None
                          and b_new - b_old > LOAD_DELTA)
            rec["verdict"] = ("load-confounded" if confounded
                             else "REGRESSED")
        else:
            rec["verdict"] = "ok"
        out.append(rec)
    return out


def main() -> int:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else THRESHOLD
    records = compare(old, new, threshold)
    fired = False
    for r in records:
        print(f"{r['query']}: {r['old']} -> {r['new']} "
              f"(x{r['ratio']}) {r['verdict']}")
        if r["verdict"] == "REGRESSED":
            fired = True
    return 1 if fired else 0


if __name__ == "__main__":
    sys.exit(main())
