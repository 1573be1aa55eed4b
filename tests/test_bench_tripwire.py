"""The per-query bench regression tripwire must fire on the actual
r6→r7 driver artifacts' numbers (VERDICT r7 ask #7: "check exists +
fires on the r6→r7 artifacts when pointed at them"). The artifacts
themselves live driver-side; the query medians below are the driver
values recorded in VERDICT.md's round-7 performance table."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from bench_tripwire import compare  # noqa: E402

R6_DRIVER = {"queries": {"q_street_pipeline": 19.50, "dd_minhash_lsh": 2.97,
                         "sim_ann_topk": 1.63, "ta_quality": 0.21,
                         "ta_fingerprint": 0.67, "ev_window": 0.22,
                         "dd_exact": 0.26}}
R7_DRIVER = {"queries": {"q_street_pipeline": 13.19, "dd_minhash_lsh": 4.58,
                         "sim_ann_topk": 2.75, "ta_quality": 0.26,
                         "ta_fingerprint": 0.955, "ev_window": 0.28,
                         "dd_exact": 0.285}}


def test_fires_on_r6_to_r7():
    recs = {r["query"]: r for r in compare(R6_DRIVER, R7_DRIVER)}
    # the three regressions the round-7 judge flagged must all fire
    for q in ("dd_minhash_lsh", "sim_ann_topk", "ta_fingerprint"):
        assert recs[q]["verdict"] == "REGRESSED", recs[q]
    # the flagship improved and must not fire
    assert recs["q_street_pipeline"]["verdict"] == "ok"


def test_load_confounding_downgrades():
    old = {"queries": {"q": 1.0},
           "run_loads": {"q": [[0.1, 0.1, 0.05]] * 3}}
    new = {"queries": {"q": 1.5},
           "run_loads": {"q": [[9.0, 9.0, 0.9]] * 3}}
    (rec,) = compare(old, new)
    assert rec["verdict"] == "load-confounded"
    # same load → genuine regression
    new["run_loads"]["q"] = [[0.1, 0.1, 0.06]] * 3
    (rec,) = compare(old, new)
    assert rec["verdict"] == "REGRESSED"


def test_quiet_when_flat():
    flat = {"queries": {"a": 1.0, "b": 2.0}}
    assert all(r["verdict"] == "ok" for r in compare(flat, flat))
