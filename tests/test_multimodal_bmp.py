"""Real media decode: pure-Python 24-bit BMP codec + the bmp:// decode
path through mapInPandas."""

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


def test_decode_media_real_path(spark, fixture_dir):
    from osm2streets_spark.operators.multimodal import (
        decode_media, media_spans,
    )

    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    media = media_spans(docs)
    dec = decode_media(media).toPandas()
    bmp_rows = dec[dec["media_ref"].str.startswith("bmp://")]
    assert len(bmp_rows) > 0
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
