"""Real media decode: pure-Python 24-bit BMP + 8-bit RGB PNG codecs
and the bmp:// / png:// decode paths through mapInPandas."""

import base64

import numpy as np
import pytest

from osm2streets_spark.sources.bmp import (
    bmp_feature, decode_bmp, encode_bmp,
)


def test_bmp_roundtrip():
    rng = np.random.RandomState(5)
    for w, h in ((1, 1), (3, 2), (8, 6), (13, 7), (32, 9)):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = encode_bmp(px)
        w2, h2, px2 = decode_bmp(data)
        assert (w2, h2) == (w, h)
        np.testing.assert_array_equal(px, px2)


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    data[28] = 32  # bpp -> 32
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_bmp_feature_deterministic():
    px = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    f1 = bmp_feature(px)
    f2 = bmp_feature(px.copy())
    assert f1 == f2 and len(f1) == 16


def test_png_roundtrip_all_filters():
    import struct
    import zlib

    from osm2streets_spark.sources.png import (
        _SIG, _chunk, decode_png, encode_png,
    )

    rng = np.random.RandomState(3)
    for w, h in ((1, 1), (8, 5), (13, 16), (33, 40)):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, px2 = decode_png(encode_png(px))
        assert (w2, h2) == (w, h)
        np.testing.assert_array_equal(px, px2)
    # Average (3) and Paeth (4) filters via a hand-built file
    px = rng.randint(0, 256, size=(6, 7, 3), dtype=np.uint8)
    stride = 7 * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(6):
        row = px[y].reshape(-1).astype(np.int32)
        f = 3 if y % 2 == 0 else 4
        raw.append(f)
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            b, c = prev[i], (prev[i - 3] if i >= 3 else 0)
            if f == 3:
                pred = (a + b) // 2
            else:
                p_, pa, pb, pc = a + b - c, 0, 0, 0
                pa, pb, pc = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            raw.append(int((row[i] - pred) % 256))
        prev = row
    ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 2, 0, 0, 0)
    data = _SIG + _chunk(b"IHDR", ihdr) \
        + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    _, _, out = decode_png(data)
    np.testing.assert_array_equal(out, px)


def test_png_rejects_malformed():
    from osm2streets_spark.sources.png import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    data[25] = 16  # IHDR bit depth -> 16
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_decode_media_real_path(spark, fixture_dir):
    from osm2streets_spark.operators.multimodal import (
        decode_media, media_spans,
    )

    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    media = media_spans(docs)
    dec = decode_media(media).toPandas()
    bmp_rows = dec[dec["media_ref"].str.startswith(("bmp://", "png://"))]
    assert len(bmp_rows) > 0
    # the corpus carries BOTH real codecs
    schemes = {r.split("://")[0] for r in bmp_rows["media_ref"]}
    assert schemes == {"bmp", "png"}
    # every bmp row's dims must equal the generator's gt
    import duckdb
    gt = duckdb.sql(
        f"select * from read_parquet('{fixture_dir}/gt_media.parquet')"
    ).df().set_index("media_ref")
    for _, r in bmp_rows.iterrows():
        g = gt.loc[r["media_ref"]]
        assert (r["width"], r["height"], r["n_frames"]) == \
            (g["width"], g["height"], 1)
        assert len(r["feature"]) == 16


def test_geojson_real_decode_path():
    """geojson:// spans carry raw GeoJSON; decode_media derives real
    dims (width=coordinate count, height=feature count) and a real
    geometry-stats feature — no deterministic fake."""
    import pandas as pd

    from osm2streets_spark.operators.multimodal import _decode_batch
    from osm2streets_spark.sources.fixtures import _geojson_span

    node_src = {1: (10.0, 50.0, "{}"), 2: (10.001, 50.001, "{}"),
                3: (10.002, 50.0, "{}")}
    way_src = [(7, [1, 2, 3], "{}"), (8, [3, 2], "{}")]
    span, gt = _geojson_span("d0", node_src, way_src, 3)
    assert gt["width"] == 5 and gt["height"] == 2 and gt["n_frames"] == 1

    pdf = pd.DataFrame({"doc_id": ["d0"], "media_ref": [span["media_ref"]],
                        "payload_b64": [span["text"]]})
    out = pd.concat(list(_decode_batch(iter([pdf]))))
    r = out.iloc[0]
    assert (int(r.width), int(r.height), int(r.n_frames)) == (5, 2, 1)
    assert len(r.feature) == 16
    # feature stats are REAL: bbox from the actual coordinates
    assert abs(r.feature[0] - 10.0) < 1e-6     # lon min
    assert abs(r.feature[1] - 10.002) < 1e-6   # lon max
    assert r.feature[8] == 2.0                 # n features
    assert r.feature[9] == 5.0                 # n coords


def test_tile_store_real_decode(spark, fixture_dir):
    """tile:// refs resolve against the external tile_store.parquet by
    (z, x, y) equi-join and the fetched PNG decodes for REAL — header
    dims match the generator's gt row for every tile ref in the
    corpus; the store's frame-count metadata rides along."""
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from osm2streets_spark.operators.multimodal import (
        decode_media, load_tile_store, media_spans)

    docs = spark.read.parquet(os.path.join(fixture_dir,
                                           "documents.parquet"))
    store = load_tile_store(spark, fixture_dir)
    assert store is not None and store.count() > 0
    media = media_spans(docs).where(
        F.col("media_ref").startswith("tile://"))
    dec = decode_media(media, tile_store=store).toPandas()
    gt = pq.read_table(os.path.join(fixture_dir, "gt_media.parquet")) \
        .to_pandas()
    gt = gt[gt.media_ref.str.startswith("tile://")]
    assert len(dec) == len(gt) > 0
    merged = dec.merge(gt, on=["doc_id", "media_ref"],
                       suffixes=("", "_gt"))
    assert len(merged) == len(gt)
    assert (merged.width == merged.width_gt).all()
    assert (merged.height == merged.height_gt).all()
    assert (merged.n_frames == merged.n_frames_gt).all()
    # dims come from real PNG headers: the fixture tiles are 8-24 px
    assert merged.width.between(8, 24).all()
