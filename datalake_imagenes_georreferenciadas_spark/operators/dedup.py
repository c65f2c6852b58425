"""Deduplication operators over document tables (SURVEY A3/A5, north star).

Five dedup families, all shuffle-conscious:

- exact: hash-groupBy on content digest — one shuffle, map-side partial agg.
- MinHash-LSH: shingle → minhash signature → band keys → equi-join on band
  → verify Jaccard. The band join turns the O(n²) similarity join into a
  shuffle-partitionable equi-join; at 100 TB the candidate set per band
  bucket stays small as long as bands×rows is tuned to the target
  threshold (standard s-curve tuning).
- SimHash: 60-bit sign-aggregated token-hash fingerprint; near-dups share
  the fingerprint (or a banded prefix at scale).
- n-gram Jaccard: exact pairwise Jaccard on shingle sets, restricted to
  LSH candidates (never all-pairs).
- embedding cosine: see operators.similarity.

Everything is built on the cross-engine md5 hash family
(functions.hashing), so each operator has a DuckDB-oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64, lsh_bands, minhash_signature, shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest, keeping the smallest id per group
    (deterministic representative — A3's first-seen-order intent,
    script_geo.py:71-77, without the nondeterminism of ``dropDuplicates``).
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("digest"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "digest", "n_copies")
    )


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Attach shingles, MinHash signature, and LSH band keys."""
    rows_per_band = num_hashes // bands
    return (
        df.withColumn("__shingles", shingles(F.col(text_col), k))
        .withColumn("__sig", minhash_signature(F.col("__shingles"), num_hashes))
        .withColumn("__bands", lsh_bands(F.col("__sig"), bands, rows_per_band))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact Jaccard verify.

    Plan shape: explode band keys → self equi-join on (band position
    implicit in key, band hash) → distinct candidate pairs → verify with
    exact shingle-set Jaccard → threshold. The only shuffles are the band
    join and the distinct — no cross join anywhere.
    """
    sig = with_minhash(df, text_col, k, num_hashes, bands).select(
        F.col(id_col), F.col("__shingles"), F.explode(F.col("__bands")).alias("band")
    )
    left = sig.select(
        F.col(id_col).alias("a_id"), F.col("__shingles").alias("a_sh"), "band"
    )
    right = sig.select(
        F.col(id_col).alias("b_id"), F.col("__shingles").alias("b_sh"), "band"
    )
    cand = (
        left.join(right, "band")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .dropDuplicates(["a_id", "b_id"])
    )
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double")
    union = F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1.0)), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash(text: Column, num_bits: int = 32) -> Column:
    """SimHash fingerprint: per bit, sign of the sum over token hashes.

    One nested higher-order expression: for each bit position, count
    tokens whose seeded hash has that bit set vs not; bit set in the
    fingerprint iff the majority does. JVM-side, no UDF.
    """
    from ..functions.hashing import tokens

    def bit_vote(b: int):
        # closure factory (PySpark infers lambda arity by signature)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    toks = tokens(text)
    tok_hashes = F.transform(toks, lambda t: hash64(t, seed=0))
    fp = F.lit(0).cast("bigint")
    for b in range(num_bits):  # unrolled: bit position must be a literal
        bit_sum = F.aggregate(tok_hashes, F.lit(0), bit_vote(b))
        fp = fp + F.when(bit_sum > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return fp


def simhash_sql(text_expr: str, num_bits: int = 32) -> str:
    """DuckDB twin of :func:`simhash` (same bits)."""
    from ..functions.hashing import hash64_sql

    toks = f"list_filter(string_split_regex(lower({text_expr}), '\\s+'), t -> t <> '')"
    th = f"list_transform({toks}, t -> {hash64_sql('t', 0)})"
    return (
        f"coalesce(list_sum([(CASE WHEN list_sum(list_transform({th}, "
        f"h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END)::BIGINT << b "
        f"FOR b IN generate_series(0, {num_bits - 1})]), 0)::BIGINT"
    )
