"""Retrieval stack — BM25, RRF fusion, cross-encoder rerank (COVERAGE
north-star: hybrid retrieval)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datalake_imagenes_georreferenciadas_spark.operators.similarity import rerank_crossencoder


def test_rerank_scores_match_reference_digest(spark):
    """The mapInPandas kernel must reproduce the documented md5 stub
    bit-for-bit (the same bytes a DuckDB oracle hashes)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    cands = spark.createDataFrame([(1, 0.5), (2, 0.4)], ["doc_id", "rrf_score"])
    out = {
        r["doc_id"]: r["ce_score"]
        for r in rerank_crossencoder(cands, docs, query_tag="ce").collect()
    }
    for doc_id, text in ((1, "alpha beta"), (2, "gamma delta")):
        expect = int(hashlib.md5(f"ce:{text}".encode()).hexdigest()[:15], 16) % 1_000_000
        assert out[doc_id] == expect


def test_rerank_only_scores_candidates(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
    )
    cands = spark.createDataFrame([(2, 0.9)], ["doc_id", "rrf_score"])
    rows = rerank_crossencoder(cands, docs).collect()
    assert [r["doc_id"] for r in rows] == [2]
    assert rows[0]["rrf_score"] == 0.9  # candidate columns pass through


def test_bm25_ranks_term_bearing_docs_first(spark):
    """Docs containing the query terms must outrank docs without them,
    and every returned score must be positive (the +1 idf variant)."""
    from datalake_imagenes_georreferenciadas_spark.plans.queries import QUERIES

    rows = QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= 10
    assert all(r["bm25"] > 0 for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks) == list(range(1, len(rows) + 1))
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
