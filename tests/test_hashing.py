"""functions.hashing — shingles, cross-engine hash, MinHash, LSH bands."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F

from datalake_imagenes_georreferenciadas_spark.functions.hashing import (
    HASH_HEX_CHARS,
    hash64,
    hash64_sql,
    lsh_bands,
    shingles,
    shingles_sql,
    tokens,
)


def _py_hash64(s: str, seed: int = 0) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:HASH_HEX_CHARS], 16)


def test_tokens_filters_empties(spark):
    df = spark.createDataFrame([("  Hello   World  ",), ("",)], ["t"])
    rows = df.select(tokens(F.col("t")).alias("tk")).collect()
    assert rows[0]["tk"] == ["hello", "world"]
    assert rows[1]["tk"] == []


def test_shingles_basic_and_short(spark):
    df = spark.createDataFrame([("a b c d e",), ("x y",), ("p q r",)], ["t"])
    rows = df.select(shingles(F.col("t"), 3).alias("sh")).collect()
    assert rows[0]["sh"] == ["a b c", "b c d", "c d e"]
    assert rows[1]["sh"] == []  # fewer than k tokens
    assert rows[2]["sh"] == ["p q r"]


def test_shingles_sql_matches_spark(spark):
    texts = ["a b c d e", "x y", "one two three four", "solo"]
    df = spark.createDataFrame([(t,) for t in texts], ["txt"])
    spark_rows = [r["sh"] for r in df.select(shingles(F.col("txt"), 3).alias("sh")).collect()]
    con = duckdb.connect()
    vals = ", ".join(f"('{t}')" for t in texts)
    duck_rows = [
        r[0]
        for r in con.sql(
            f"SELECT {shingles_sql('txt', 3)} FROM (VALUES {vals}) AS v(txt)"
        ).fetchall()
    ]
    assert spark_rows == duck_rows


def test_hash64_matches_python_and_duckdb(spark):
    df = spark.createDataFrame([("hello",), ("mundo",)], ["s"])
    got = [r["h"] for r in df.select(hash64(F.col("s"), seed=7).alias("h")).collect()]
    assert got == [_py_hash64("hello", 7), _py_hash64("mundo", 7)]
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.sql(
            f"SELECT {hash64_sql('s', 7)} FROM (VALUES ('hello'), ('mundo')) AS v(s)"
        ).fetchall()
    ]
    assert got == duck


def test_hash64_nonnegative_range(spark):
    df = spark.createDataFrame([(str(i),) for i in range(50)], ["s"])
    vals = [r["h"] for r in df.select(hash64(F.col("s")).alias("h")).collect()]
    assert all(0 <= v < 2**60 for v in vals)


def test_lsh_bands_shape_and_determinism(spark):
    df = spark.createDataFrame([([1, 2, 3, 4, 5, 6, 7, 8],)], ["sig"])
    bands = df.select(lsh_bands(F.col("sig"), 4, 2).alias("b")).collect()[0]["b"]
    assert len(bands) == 4
    assert len(set(bands)) == 4  # different slices → different keys
    # deterministic: same input → same bands
    again = df.select(lsh_bands(F.col("sig"), 4, 2).alias("b")).collect()[0]["b"]
    assert bands == again
    # matches hand-computed md5 of "0|1,2"
    assert bands[0] == hashlib.md5(b"0|1,2").hexdigest()
