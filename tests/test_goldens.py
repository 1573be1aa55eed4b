"""Golden-snapshot regression tests (reference tests/src/lib.rs:17-90
analogue): the rendered network of every sf0.001 fixture doc must match
the committed snapshot — properties exactly, coordinates within 1e-6°
(SURVEY.md §5 tolerance strategy)."""

import glob
import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))

pytestmark = pytest.mark.skipif(
    not GOLDENS, reason="no goldens committed yet (scripts/make_goldens.py)")


@pytest.fixture(scope="module")
def current(spark, fixture_dir):
    from osm2streets_spark.plans.pipeline import flagship_query
    feats = flagship_query(spark, fixture_dir).collect()
    by_doc = {}
    for r in feats:
        by_doc.setdefault(r.doc_id, []).append({
            "feature_type": r.feature_type,
            "feature_id": r.feature_id,
            "feature": json.loads(r.feature_json),
            "tile": [r.tile_z, r.tile_x, r.tile_y],
        })
    for items in by_doc.values():
        items.sort(key=lambda x: (x["feature_type"], x["feature_id"]))
    return by_doc


def _coords_close(a, b, eps=1e-6):
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(a - b) <= eps
    if isinstance(a, list) and isinstance(b, list) and len(a) == len(b):
        return all(_coords_close(x, y, eps) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("path", GOLDENS, ids=lambda p: os.path.basename(p))
def test_golden(current, path):
    want = json.load(open(path))
    doc_id = os.path.basename(path)[:-5]
    got = None
    for k, v in current.items():
        if k.replace(":", "_") == doc_id:
            got = v
            break
    assert got is not None, f"doc {doc_id} missing from pipeline output"
    assert len(got) == len(want), \
        f"{doc_id}: {len(got)} features vs golden {len(want)}"
    for g, w in zip(got, want):
        assert g["feature_type"] == w["feature_type"]
        assert g["feature_id"] == w["feature_id"]
        assert g["tile"] == w["tile"]
        gp = g["feature"]["properties"]
        wp = w["feature"]["properties"]
        assert gp == wp, f"{doc_id}/{g['feature_id']}: properties differ"
        assert _coords_close(g["feature"]["geometry"]["coordinates"],
                             w["feature"]["geometry"]["coordinates"]), \
            f"{doc_id}/{g['feature_id']}: geometry drifted beyond 1e-6°"
