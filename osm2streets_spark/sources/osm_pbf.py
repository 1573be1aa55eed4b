"""S1 (PBF half): minimal OSM PBF decoder, pure Python.

The reference reader accepts both XML and PBF extracts
(streets_reader/src/osm_reader/reader.rs:23-148 dispatches on the
input bytes; its PBF path uses the osmpbf crate). The container has no
protobuf/osmpbf library, so this module hand-rolls the public PBF
wire format (https://wiki.openstreetmap.org/wiki/PBF_Format):

  file   := repeated [u32 BE header_len][BlobHeader][Blob]
  BlobHeader := {1: type (string), 3: datasize}
  Blob       := {1: raw bytes | 3: zlib_data} (+ 2: raw_size)
  PrimitiveBlock := {1: StringTable, 2: repeated PrimitiveGroup,
                     17: granularity=100, 19: lat_offset, 20: lon_offset}
  PrimitiveGroup := {1: repeated Node, 2: DenseNodes, 3: repeated Way,
                     4: repeated Relation}
  DenseNodes := {1: packed sint64 id Δ, 8/9: packed sint64 lat/lon Δ,
                 10: packed keys_vals (0-terminated per node)}
  Way := {1: id, 2/3: packed key/val string ids, 8: packed sint64 refs Δ}
  Relation := {1: id, 2/3: keys/vals, 8: packed roles_sid,
               9: packed sint64 memids Δ, 10: packed member types}

coordinate = 1e-9 * (offset + granularity * raw).

Used inside the same distributed parse as the XML path (osm_xml.py):
a span of kind='osm_pbf' carries the base64 blob bytes, decoded per
document inside mapInPandas — at 100 TB the PBF blobs are a binary
column and the decode stays on the executors.
"""

from __future__ import annotations

import json
import zlib

_MEMBER_TYPES = ("node", "way", "relation")


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes):
    """Iterate (field_number, value) over a protobuf message. Varint
    fields yield ints; length-delimited fields yield bytes; fixed32/64
    yield raw bytes (unused by the OSM schema we read)."""
    pos, end = 0, len(buf)
    while pos < end:
        key, pos = _varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, val


def _packed(buf: bytes, zigzag: bool = False) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(_zigzag(v) if zigzag else v)
    return out


def _undelta(vals: list[int]) -> list[int]:
    out = []
    acc = 0
    for v in vals:
        acc += v
        out.append(acc)
    return out


def iter_primitive_blocks(data: bytes):
    """Yield decompressed PrimitiveBlock payloads from a .osm.pbf file."""
    pos, end = 0, len(data)
    while pos + 4 <= end:
        hlen = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        header = data[pos:pos + hlen]
        pos += hlen
        btype, dsize = "", 0
        for fno, val in _fields(header):
            if fno == 1:
                btype = val.decode("utf-8")
            elif fno == 3:
                dsize = val
        blob = data[pos:pos + dsize]
        pos += dsize
        payload = None
        other_codec = None
        for fno, val in _fields(blob):
            if fno == 1:
                payload = val
            elif fno == 3:
                payload = zlib.decompress(val)
            elif fno in (4, 5, 6, 7):
                # lzma / legacy-bzip2 / lz4 / zstd — legal per the PBF
                # spec but not decoded here; fail loudly rather than
                # silently parsing the extract as empty
                other_codec = {4: "lzma", 5: "bzip2", 6: "lz4",
                               7: "zstd"}[fno]
        if btype not in ("OSMHeader", "OSMData"):
            # the PBF spec says parsers should skip unrecognized blob
            # types — even ones whose codec we can't decode
            continue
        if payload is None:
            if other_codec:
                raise ValueError(
                    f"PBF Blob uses unsupported compression "
                    f"'{other_codec}' (only raw and zlib are decoded)")
            raise ValueError("PBF Blob has no recognized payload field")
        if btype == "OSMHeader":
            for fno, val in _fields(payload):
                if fno == 4:  # required_features (repeated string)
                    feat = val.decode("utf-8")
                    if feat not in ("OsmSchema-V0.6", "DenseNodes"):
                        raise ValueError(
                            f"PBF header requires unsupported feature "
                            f"'{feat}'")
        elif btype == "OSMData":
            yield payload


def _tags_json(keys, vals, strings) -> str:
    tags = {strings[k]: strings[v] for k, v in zip(keys, vals)}
    return json.dumps(dict(sorted(tags.items())), separators=(",", ":"))


def parse_pbf(data: bytes):
    """→ (nodes {id: (lon, lat, tags_json)}, ways [(id, refs, tags_json)],
    relations [(id, members, tags_json)]) — the same shapes the XML
    parser builds, so the rest of S1 (missing-ref drop, boundary clip)
    is shared."""
    nodes: dict[int, tuple] = {}
    ways: list[tuple] = []
    relations: list[tuple] = []
    empty = json.dumps({})
    for block in iter_primitive_blocks(data):
        strings: list[str] = []
        groups: list[bytes] = []
        gran, lat_off, lon_off = 100, 0, 0
        for fno, val in _fields(block):
            if fno == 1:
                strings = [v.decode("utf-8", "replace")
                           for f, v in _fields(val) if f == 1]
            elif fno == 2:
                groups.append(val)
            elif fno == 17:
                gran = val
            elif fno == 19:
                lat_off = val
            elif fno == 20:
                lon_off = val

        def coord(off, raw):
            return 1e-9 * (off + gran * raw)

        for g in groups:
            for fno, val in _fields(g):
                if fno == 1:        # plain Node
                    nid = lat = lon = 0
                    keys = vals = ()
                    for f, v in _fields(val):
                        if f == 1:
                            nid = _zigzag(v)
                        elif f == 2:
                            keys = _packed(v)
                        elif f == 3:
                            vals = _packed(v)
                        elif f == 8:
                            lat = _zigzag(v)
                        elif f == 9:
                            lon = _zigzag(v)
                    nodes[nid] = (coord(lon_off, lon), coord(lat_off, lat),
                                  _tags_json(keys, vals, strings))
                elif fno == 2:      # DenseNodes
                    ids = lats = lons = []
                    kv: list[int] = []
                    for f, v in _fields(val):
                        if f == 1:
                            ids = _undelta(_packed(v, zigzag=True))
                        elif f == 8:
                            lats = _undelta(_packed(v, zigzag=True))
                        elif f == 9:
                            lons = _undelta(_packed(v, zigzag=True))
                        elif f == 10:
                            kv = _packed(v)
                    ki = 0
                    for i, nid in enumerate(ids):
                        if kv:
                            keys, vals = [], []
                            while ki < len(kv) and kv[ki] != 0:
                                keys.append(kv[ki])
                                vals.append(kv[ki + 1])
                                ki += 2
                            ki += 1  # skip the 0 terminator
                            tj = _tags_json(keys, vals, strings)
                        else:
                            tj = empty
                        nodes[nid] = (coord(lon_off, lons[i]),
                                      coord(lat_off, lats[i]), tj)
                elif fno == 3:      # Way
                    wid = 0
                    keys = vals = ()
                    refs: list[int] = []
                    for f, v in _fields(val):
                        if f == 1:
                            wid = v
                        elif f == 2:
                            keys = _packed(v)
                        elif f == 3:
                            vals = _packed(v)
                        elif f == 8:
                            refs = _undelta(_packed(v, zigzag=True))
                    ways.append((wid, refs, _tags_json(keys, vals, strings)))
                elif fno == 4:      # Relation
                    rid = 0
                    keys = vals = ()
                    roles: list[int] = []
                    memids: list[int] = []
                    mtypes: list[int] = []
                    for f, v in _fields(val):
                        if f == 1:
                            rid = v
                        elif f == 2:
                            keys = _packed(v)
                        elif f == 3:
                            vals = _packed(v)
                        elif f == 8:
                            roles = _packed(v)
                        elif f == 9:
                            memids = _undelta(_packed(v, zigzag=True))
                        elif f == 10:
                            mtypes = _packed(v)
                    members = [
                        {"role": strings[r], "type": _MEMBER_TYPES[t],
                         "ref": m}
                        for r, m, t in zip(roles, memids, mtypes)
                    ]
                    relations.append(
                        (rid, members, _tags_json(keys, vals, strings)))
    return nodes, ways, relations
