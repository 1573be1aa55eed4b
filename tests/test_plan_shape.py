"""Physical-plan shape regression guard for the flagship pipeline.

Round 2 silently shipped a two-pass T6 that doubled a subtree's
exchanges; nothing caught it until the driver measured the wall time.
This test pins the plan shape so a refactor that adds an exchange, a
cartesian product, or an extra checkpoint boundary fails CI before it
costs a round. The ceilings are the counts measured on the current
plan — raise them only deliberately, with a rationale."""

from __future__ import annotations

import pytest

from osm2streets_spark.plans.pipeline import (
    load_documents, build_street_network,
)

# (stage, max Exchange nodes, max checkpoint-boundary scans) in the
# executed (pre-AQE-initial) physical plan at sf0.001. Measured 2026-08
# on Spark 4.1. Round 5 LOWERED the Exchange ceilings 254→52 (features)
# and 233→52 (intersections): the parse stage is now a lazy
# localCheckpoint instead of persist, so each consumer's plan embeds a
# LogicalRDD leaf rather than the full parse subtree (which carried ~200
# duplicated exchanges through every downstream plan and dominated
# driver analysis time). The RDD-scan ceilings rose correspondingly
# (25→35): every former InMemoryRelation reference to the parse frame is
# now a checkpoint-boundary scan — same count of references, different
# node type, one extra actual boundary (the parse materialization).
_CEILINGS = {
    "features": (52, 35),
    "roads": (4, 2),
    "trims": (4, 2),
    "intersections": (52, 34),
}


@pytest.fixture(scope="module")
def net(spark, fixture_dir):
    spark.catalog.clearCache()
    return build_street_network(spark, load_documents(spark, fixture_dir))


@pytest.mark.parametrize("stage", list(_CEILINGS))
def test_flagship_plan_shape(net, stage):
    plan = net[stage]._jdf.queryExecution().executedPlan().toString()
    max_exchanges, max_rdd_scans = _CEILINGS[stage]
    assert "CartesianProduct" not in plan, f"{stage}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{stage}: BNLJ"
    n_ex = plan.count("Exchange")
    n_rdd = plan.count("Scan ExistingRDD")
    assert n_ex <= max_exchanges, (
        f"{stage}: {n_ex} Exchange nodes > ceiling {max_exchanges} — a "
        f"refactor added shuffles; audit with explain before raising")
    assert n_rdd <= max_rdd_scans, (
        f"{stage}: {n_rdd} checkpoint-boundary scans > ceiling "
        f"{max_rdd_scans} — extra localCheckpoint/persist boundary added")


def test_registry_first50_composition():
    """The round driver executes only the FIRST 50 entries of queries().
    Round 7 added two queries and silently pushed mm_media_decode /
    mm_media_refs (then positions 51-52) out of the window — the whole
    multimodal family lost its CORRECTNESS row and nothing flagged it.
    Pin the composition: every operator family must have a row inside
    the window; the two rows that ride outside are the designated thin
    variants (s_stop_lines, s_debug_cw_order — their layers are covered
    by sn_stop_lines and the geometry oracles). Adding a 53rd query
    without deciding what falls out now fails here instead of in the
    next VERDICT."""
    import __spark_entry__ as E

    names = list(E.queries())
    assert len(names) == 52, f"registry grew to {len(names)} — re-decide " \
        "the 50-query window composition deliberately"
    window, outside = set(names[:50]), set(names[50:])
    assert outside == {"s_stop_lines", "s_debug_cw_order"}, (
        f"queries outside the driver's 50-row window changed: {outside}")
    for family_member in ("mm_media_decode", "mm_media_refs"):
        assert family_member in window
    assert set(E.oracle_sql()) == set(names)
