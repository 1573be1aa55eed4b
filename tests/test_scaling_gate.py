"""Scaling-evidence drift guard (round-6 verdict ask #5).

The single-box 4->16 raw efficiency is capped by the box's DRAM/
allocator ceiling (BENCH/BASELINE.md) — the zero-Spark kernel probe
reproduces ~0.69 with no engine code in the loop. The number that IS
engine-attributable is wl_norm = raw_eff / kernel_ceil: how close the
pipeline gets to what the same kernels achieve with no coordination at
all. This gate recomputes the published numbers from the machine-
readable sidecar (BENCH/scaling_evidence.json, written by
scripts/run_scaling16.py) and FAILS if

  * the stored raw efficiency / wl_norm don't match their own inputs
    (hand-edit drift), or
  * the criterion row's engine-attributable efficiency drops below
    0.8 — so a future change that genuinely worsens coordination can't
    hide behind the hardware ceiling.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
SIDECAR = os.path.join(HERE, os.pardir, "BENCH", "scaling_evidence.json")


def _load():
    with open(SIDECAR) as f:
        return json.load(f)


def test_sidecar_internally_consistent():
    ev = _load()
    ratio = ev["cores_b"] / ev["cores_a"]
    for row in ev["rows"]:
        raw = row["a_median"] / (ratio * row["b_median"])
        assert abs(raw - row["raw_eff"]) < 0.01, (
            f"{row['sf']}: stored raw_eff {row['raw_eff']} != recomputed "
            f"{raw:.3f} from its own medians")
        wl = row["raw_eff"] / row["kernel_ceil"]
        assert abs(wl - row["wl_norm"]) < 0.01, (
            f"{row['sf']}: stored wl_norm {row['wl_norm']} != recomputed "
            f"{wl:.3f}")
        # medians must lie within their own run lists
        assert min(row["a_runs"]) - 1 <= row["a_median"] <= max(
            row["a_runs"]) + 1
        assert min(row["b_runs"]) - 1 <= row["b_median"] <= max(
            row["b_runs"]) + 1


def test_criterion_engine_attributable_efficiency():
    ev = _load()
    crit = next(r for r in ev["rows"] if r["sf"] == ev["criterion_sf"])
    assert crit["docs"] == max(r["docs"] for r in ev["rows"])
    wl = crit["raw_eff"] / crit["kernel_ceil"]
    assert wl >= 0.8, (
        f"engine-attributable criterion efficiency {wl:.3f} < 0.8: the "
        f"pipeline lost scaling beyond the measured hardware ceiling — "
        f"a real coordination regression, not box noise")


def test_kernel_ceiling_is_measured_not_assumed():
    """The ceiling must stay in the plausible measured band for this
    box (gotcha: probes outside [0.45, 1.05] are invalid); a ceiling
    of ~raw_eff would make wl_norm vacuously 1.0."""
    ev = _load()
    for row in ev["rows"]:
        assert 0.45 <= row["kernel_ceil"] <= 1.05
