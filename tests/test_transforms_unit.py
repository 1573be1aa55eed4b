"""Pure-Python tests of the per-doc transform kernels (T1-T4, T3 zip)."""

import json

from osm2streets_spark.operators.transforms import (
    remove_disconnected, collapse_short_roads, collapse_degenerate,
    zip_sidepaths,
)


def mk_road(rid, src, dst, xy, hw="residential", lanes="s|dd|s",
            driveable=True, **kw):
    specs = []
    for ch in lanes:
        lt = {"s": "sidewalk", "|": "buffer", "d": "driving",
              "b": "biking", "f": "footway"}[ch]
        specs.append({"lt": lt, "dir": "forward",
                      "width": {"s": 1.5, "|": 0.1, "d": 3.0, "b": 1.5,
                                "f": 2.0}[ch],
                      "subtype": "", "allowed_turns": []})
    r = {
        "road_id": rid, "way_id": rid, "src_i": src, "dst_i": dst,
        "xy": [float(v) for v in xy], "highway_type": hw, "name": "X",
        "layer": 0, "speed_kph": None, "oneway_dir": "",
        "lane_specs_json": json.dumps(specs, separators=(",", ":")),
        "lane_chars": lanes, "dir_chars": "^" * len(lanes),
        "total_width": sum(s["width"] for s in specs),
        "driveable": driveable, "internal_junction_road": False,
        "too_short": False, "osm_way_ids": [rid],
        "lon0": 0.0, "lat0": 0.0,
    }
    r.update(kw)
    return r


def test_remove_disconnected_keeps_largest():
    roads = [
        mk_road(1, 10, 11, [0, 0, 100, 0]),
        mk_road(2, 11, 12, [100, 0, 200, 0]),
        mk_road(3, 20, 21, [500, 500, 600, 500]),  # detached
    ]
    kept = remove_disconnected(roads)
    assert sorted(r["road_id"] for r in kept) == [1, 2]


def test_collapse_short_road_merges_endpoints():
    roads = [
        mk_road(1, 10, 11, [0, 0, 100, 0]),
        mk_road(2, 11, 12, [100, 0, 103, 0], internal_junction_road=True),
        mk_road(3, 12, 13, [103, 0, 200, 0]),
    ]
    out = collapse_short_roads(roads)
    assert sorted(r["road_id"] for r in out) == [1, 3]
    r3 = next(r for r in out if r["road_id"] == 3)
    assert r3["src_i"] == 11  # dst of candidate merged into its src


def test_collapse_degenerate_splices():
    roads = [
        mk_road(1, 10, 11, [0, 0, 100, 0]),
        mk_road(2, 11, 12, [100, 0, 200, 0]),
    ]
    out = collapse_degenerate(roads)
    assert len(out) == 1
    merged = out[0]
    assert merged["src_i"] == 10 and merged["dst_i"] == 12
    assert sorted(merged["osm_way_ids"]) == [1, 2]


def test_zip_sidepath_splices_lanes():
    """Connector walk (zip_sidepath.rs:28-73): each sidepath endpoint
    has exactly one <10 m connector to the main road; lanes splice into
    EVERY main segment along the driving path, plus a planter buffer;
    the sidepath is removed and the connectors stay."""
    main_a = mk_road(1, 10, 11, [0, 0, 100, 0], hw="primary")
    main_b = mk_road(2, 11, 12, [100, 0, 200, 0], hw="primary")
    track = mk_road(3, 20, 21, [0, 8, 200, 8], hw="cycleway", lanes="b",
                    driveable=False)
    conn_w = mk_road(4, 10, 20, [0, 0, 0, 8], hw="footway", lanes="f",
                     driveable=False)
    conn_e = mk_road(5, 12, 21, [200, 0, 200, 8], hw="footway", lanes="f",
                     driveable=False)
    out = zip_sidepaths([main_a, main_b, track, conn_w, conn_e])
    by_id = {r["road_id"]: r for r in out}
    assert 3 not in by_id                      # sidepath removed
    assert 4 in by_id and 5 in by_id           # connectors stay
    for rid in (1, 2):                         # BOTH main segments zipped
        z = by_id[rid]
        # track is north (left of west->east travel): bike + planter
        # land inside nothing (first lane is sidewalk -> idx 1)
        assert z["lane_chars"] == "sb||dd|s", z["lane_chars"]
        assert z["total_width"] == main_a["total_width"] + 1.5 + 2.0


def test_zip_sidepath_requires_connectors():
    """Without <10 m connectors at both endpoints there is no zip —
    the old midpoint-distance heuristic would have merged these."""
    main = mk_road(1, 10, 11, [0, 0, 200, 0], hw="primary")
    near = mk_road(2, 20, 21, [0, 8, 200, 8], hw="cycleway", lanes="b",
                   driveable=False)
    out = zip_sidepaths([main, near])
    assert len(out) == 2



def test_split_gt_actually_splits(fixture_dir):
    """The s_split_transforms CORRECTNESS row is only meaningful if the
    lowered threshold actually fires: dense_cell docs (49 roads > 24)
    must take the per-cell path (T4 skipped -> disconnected fragments
    survive, seam trims frozen), producing output that DIFFERS from the
    unsplit gt for those docs and matches it for the sparse ones."""
    import duckdb

    from osm2streets_spark.sources.fixtures import (
        ensure_split_transforms_gt,
    )

    ensure_split_transforms_gt(fixture_dir)
    con = duckdb.connect()
    split_n, unsplit_n = con.execute(f"""
      select
        (select count(*) from
            read_parquet('{fixture_dir}/gt_split_transformed.parquet')
         where doc_id like 'dense_cell%'),
        (select count(*) from
            read_parquet('{fixture_dir}/gt_transformed.parquet')
         where doc_id like 'dense_cell%')
    """).fetchone()
    assert split_n > unsplit_n, (
        "split path left dense_cell output identical — threshold "
        "did not fire")
    same = con.execute(f"""
      with a as (select doc_id, way_id, trimmed_length, lane_chars from
          read_parquet('{fixture_dir}/gt_split_transformed.parquet')
          where doc_id not like 'dense_cell%'),
           b as (select doc_id, way_id, trimmed_length, lane_chars from
          read_parquet('{fixture_dir}/gt_transformed.parquet')
          where doc_id not like 'dense_cell%')
      select (select count(*) from (select * from a except
              select * from b)) +
             (select count(*) from (select * from b except
              select * from a))
    """).fetchone()[0]
    assert same == 0, "sparse docs must be unaffected by the threshold"
