"""Ingest the reference's real-world test areas as documents rows.

The reference ships 30 real OSM extracts (tests/src/<area>/input.osm,
Overpass exports) with an optional clip polygon (boundary.json) and a
golden StreetNetwork render (geometry.json) produced by its own engine
(tests/src/lib.rs:17-90). This module wraps each area into a row of the
interleaved documents table (doc_id, spans) so the SAME pipeline that
serves the synthetic corpus runs the real fixtures — the parity gate
against the actual reference output.

Span shape mirrors the corpus generator (fixtures.py): the OSM XML is
chunked into several kind='osm_xml' spans (the parser concatenates in
offset order, so chunk boundaries are arbitrary) with a media span
interleaved, plus one kind='boundary' span carrying the clip ring.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

REF_SRC = "/root/reference/tests/src"
CHUNK = 256 * 1024  # span payload size — mimics interleaved fragments

# country → driving side (streets_reader/src/lib.rs:50-77 resolves the
# country and derives the side; the golden's country_code is the
# reference's own answer, so parity runs use it directly)
LEFT_DRIVING_COUNTRIES = {
    "GB", "AU", "VI",  # UK areas, Perth/Fremantle, Frederiksted (USVI)
    "IE", "NZ", "JP", "IN", "ZA", "TH", "ID", "MY", "KE",
}


def area_driving_side(area: str, src: str = REF_SRC) -> str:
    cc = load_golden(area, src).get("country_code") or ""
    return "left" if cc in LEFT_DRIVING_COUNTRIES else "right"


def list_reference_areas(src: str = REF_SRC) -> list[str]:
    """Area names with an OSM input — XML or PBF (sources/osm_pbf.py
    decodes the latter, mirroring reader.rs's dual-format dispatch)."""
    out = []
    for name in sorted(os.listdir(src)):
        if (os.path.isfile(os.path.join(src, name, "input.osm"))
                or os.path.isfile(os.path.join(src, name, "input.osm.pbf"))):
            out.append(name)
    return out


def _inner_xml(raw: str) -> str:
    """Strip the <?xml?> prolog and the <osm> root element wrapper —
    the span parser wraps fragments in its own <osm> root."""
    m = re.search(r"<osm[^>]*>", raw)
    end = raw.rfind("</osm>")
    if m is None or end < 0:
        return raw
    return raw[m.end():end]


def _boundary_ring(path: str) -> list | None:
    """boundary.json is a GeoJSON FeatureCollection with one Polygon;
    the parser's 'boundary' span carries the bare ring (list of
    [lon, lat])."""
    if not os.path.exists(path):
        return None
    gj = json.load(open(path))
    feat = gj["features"][0]
    return feat["geometry"]["coordinates"][0]


def area_document(area: str, src: str = REF_SRC) -> dict:
    """One documents-table row for a reference area. XML areas chunk the
    markup into osm_xml spans; PBF areas chunk the base64 blob bytes
    into osm_pbf spans (decoded executor-side, sources/osm_pbf.py)."""
    xml_path = os.path.join(src, area, "input.osm")
    if os.path.isfile(xml_path):
        kind = "osm_xml"
        payload = _inner_xml(open(xml_path, encoding="utf-8").read())
    else:
        import base64
        kind = "osm_pbf"
        payload = base64.b64encode(
            open(os.path.join(src, area, "input.osm.pbf"), "rb").read()
        ).decode("ascii")
    spans = []
    off = 0
    # interleave: payload chunk / media ref / chunk ... (the pipeline's
    # span-sequence passthrough invariant is exercised on real payloads)
    for i in range(0, len(payload), CHUNK):
        spans.append({"kind": kind, "text": payload[i:i + CHUNK],
                      "media_ref": "", "offset": off})
        off += 1
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"tile://ref/{area}/{i // CHUNK}.pbf",
                      "offset": off})
        off += 1
    ring = _boundary_ring(os.path.join(src, area, "boundary.json"))
    if ring is not None:
        spans.append({"kind": "boundary",
                      "text": json.dumps(ring, separators=(",", ":")),
                      "media_ref": "", "offset": off})
    return {"doc_id": f"ref:{area}", "spans": spans}


def reference_documents(spark, areas: list[str] | None = None,
                        src: str = REF_SRC):
    """DataFrame(doc_id, spans) over the chosen reference areas."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )
    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(StructType([
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]))),
    ])
    areas = areas or list_reference_areas(src)
    rows = [area_document(a, src) for a in areas]
    return spark.createDataFrame(
        [(r["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in r["spans"]]) for r in rows],
        schema=schema,
    )


@lru_cache(maxsize=None)
def load_golden(area: str, src: str = REF_SRC) -> dict:
    """Parse an area's geometry.json golden into {roads, intersections,
    country_code} with plain-dict features."""
    gj = json.load(open(os.path.join(src, area, "geometry.json")))
    roads, ints = [], []
    for ft in gj["features"]:
        p = ft["properties"]
        ring = ft["geometry"]["coordinates"][0]
        rec = {"ring": ring, **p}
        if p.get("type") == "road":
            roads.append(rec)
        elif p.get("type") == "intersection":
            ints.append(rec)
    return {"roads": roads, "intersections": ints,
            "country_code": gj.get("country_code")}
