"""Auto-density LSH (r18): the corpus-derived dial and its contracts.

The law — dial = clamp(ceil(log2 n) − c, lo, hi) — must (1) reproduce
every measured density-matched setting from SCALING.md's demos, (2) be
integer-exact so the DuckDB oracle's length(bin(n-1)) twin can never
disagree at a band boundary, and (3) make the auto operators exactly
equal to the explicit-parameter operators at the derived setting.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datalake_imagenes_georreferenciadas_spark.operators.dedup import (
    auto_band_bits,
    simhash_pairs,
    simhash_pairs_auto,
)
from datalake_imagenes_georreferenciadas_spark.operators.similarity import (
    auto_planes_per_band,
    cosine_near_pairs,
    cosine_near_pairs_auto,
)

SF0001 = "/root/testdata/sf0.001"


def test_cosine_dial_reproduces_all_measured_settings():
    # SCALING.md density demos: 2k vecs -> 5 (registered base),
    # 16k -> 8 (x4.9 for x8 data), 32k -> 9 (x2.13 per doubling)
    assert auto_planes_per_band(2000) == 5
    assert auto_planes_per_band(16000) == 8
    assert auto_planes_per_band(32000) == 9
    # one plane per doubling along the law region
    assert auto_planes_per_band(4000) == 6
    assert auto_planes_per_band(8000) == 7


def test_simhash_dial_reproduces_registered_base():
    # 5k docs -> 8 (the registered 32/8); +1 bit per doubling
    assert auto_band_bits(5000) == 8
    assert auto_band_bits(10000) == 9
    assert auto_band_bits(40000) == 11
    assert auto_band_bits(80000) == 12


def test_dial_clamps_and_degenerate_corpora():
    assert auto_planes_per_band(500) == 4  # lo
    assert auto_planes_per_band(10**9) == 16  # hi
    assert auto_planes_per_band(0) == 4
    assert auto_planes_per_band(1) == 4
    assert auto_band_bits(500) == 6  # lo
    assert auto_band_bits(10**9) == 15  # hi (num_bits 60 <= 63)
    assert auto_band_bits(0) == 6
    # the simhash pigeonhole precondition holds at every clamp value:
    # 4 bands > max_hamming 3 and 4*hi = 60 <= 63
    for n in (0, 1, 2, 500, 5000, 10**9):
        bb = auto_band_bits(n)
        assert 4 * bb <= 63 and 4 > 3


def test_integer_exact_ceil_log2_matches_duckdb_twin():
    """(n-1).bit_length() must equal the oracle's length(bin(n-1)) for
    every n — including exact powers of two, where a float log2 could
    disagree by one ulp and shift the whole banding family."""
    con = duckdb.connect()
    ns = list(range(2, 600)) + [
        2**k + d for k in range(9, 40) for d in (-1, 0, 1)
    ]
    rows = con.execute(
        "SELECT n, length(bin(greatest(n, 2) - 1)) FROM (SELECT unnest(?::BIGINT[]) AS n)",
        [ns],
    ).fetchall()
    for n, duck in rows:
        assert duck == (max(n, 2) - 1).bit_length(), n


@pytest.mark.usefixtures("spark")
def test_auto_operators_equal_explicit_at_derived_setting(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    n_docs = docs.count()
    bb = auto_band_bits(n_docs)
    auto = simhash_pairs_auto(docs).orderBy("a_id", "b_id").collect()
    explicit = (
        simhash_pairs(docs, num_bits=4 * bb, band_bits=bb)
        .orderBy("a_id", "b_id")
        .collect()
    )
    assert auto == explicit and len(auto) > 0

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    p = auto_planes_per_band(emb.count())
    auto_c = cosine_near_pairs_auto(emb).orderBy("a_id", "b_id").collect()
    explicit_c = (
        cosine_near_pairs(emb, planes_per_band=p)
        .orderBy("a_id", "b_id")
        .collect()
    )
    assert auto_c == explicit_c and len(auto_c) > 0
