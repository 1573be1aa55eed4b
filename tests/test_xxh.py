"""Direct parity test: osm2streets_spark.xxh.xxhash64 vs Spark's
builtin xxhash64 expression.

The whole gt-parquet oracle chain (plans/sequential.py ids) hinges on
this being bit-identical, so exercise every byte-length tail path
(0..64-byte strings hit the 32-byte stripe loop, 8-byte words, 4-byte
step, and 1-byte tail), int64 values across the range, None args, and
multi-arg chaining."""

from __future__ import annotations

import random

from pyspark.sql import Row, functions as F

from osm2streets_spark.xxh import xxhash64


def test_xxhash64_strings_all_lengths(spark):
    rng = random.Random(1234)
    alphabet = "abcXYZ 0189_éü€☃"  # multi-byte UTF-8 included
    vals = ["".join(rng.choice(alphabet) for _ in range(n))
            for n in range(0, 65)]
    # pad with long strings well past one 32-byte stripe
    vals += ["".join(rng.choice(alphabet) for _ in range(n))
             for n in (100, 255, 1024)]
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(vals)])
    got = {r["i"]: r["h"]
           for r in df.select("i", F.xxhash64("s").alias("h")).collect()}
    for i, s in enumerate(vals):
        assert got[i] == xxhash64(s), f"string len={len(s)} mismatch"


def test_xxhash64_longs(spark):
    rng = random.Random(99)
    vals = [0, 1, -1, 2**31, -(2**31), 2**53 + 7, 2**63 - 1, -(2**63)]
    vals += [rng.randrange(-(2**63), 2**63) for _ in range(40)]
    df = spark.createDataFrame([Row(i=i, v=v) for i, v in enumerate(vals)],
                               schema="i int, v long")
    got = {r["i"]: r["h"]
           for r in df.select("i", F.xxhash64("v").alias("h")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == xxhash64(v), f"long {v} mismatch"


def test_xxhash64_multi_arg_chaining_with_nulls(spark):
    rng = random.Random(7)
    rows = []
    for i in range(50):
        s1 = None if rng.random() < 0.2 else \
            "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 20)))
        v = None if rng.random() < 0.2 else rng.randrange(-(2**62), 2**62)
        s2 = "".join(rng.choice("xyz:/") for _ in range(rng.randrange(0, 40)))
        rows.append(Row(i=i, s1=s1, v=v, s2=s2))
    df = spark.createDataFrame(rows, schema="i int, s1 string, v long, s2 string")
    got = {r["i"]: r["h"] for r in df.select(
        "i", F.xxhash64("s1", "v", "s2").alias("h")).collect()}
    for r in rows:
        assert got[r.i] == xxhash64(r.s1, r.v, r.s2), \
            f"chain ({r.s1!r}, {r.v!r}, {r.s2!r}) mismatch"
