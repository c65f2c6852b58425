"""Registry segment 16 (round 19 additions — append-only registrations).

Duplication-aware auto-density SimHash: closes the one r18 scale-ladder
waiver. The r18 count dial (``dedup_simhash_pairs_auto``) widens bands
one bit per corpus doubling — correct for decorrelated growth, but a
copy-correlated corpus (the realistic web case, and exactly what the
ladder's scaled axis builds) densifies band buckets FASTER than n, so
the count dial under-widens precisely when dedup matters most (measured:
candidates ×2.42 per doubling at the count dial's widths). The budget
dial here MEASURES the banded collision mass C(w) at every candidate
width from one probe-width fingerprint pass and picks the narrowest
width whose candidate volume fits 64 pairs/doc — linear BY CONSTRUCTION
on every growth axis. The oracle replicates the entire derivation
(probe keys → bucket counts → per-width masses → min-w budget scan) in
integer SQL, so no hand-picked per-corpus parameter exists in either
engine.

Reference parity note: the reference (script_geo.py) has no dedup at
all; this is the beyond-survey LLM-pipeline north-star family at its
100 TB operating point.
"""

from ._qbase import (
    D,
    DataFrame,
    SparkSession,
    register,
    table,
)
from ..operators.dedup import _AUTO2_LO, _AUTO2_TAU, _AUTO2_W_PROBE

#: DuckDB twin of operators.dedup.simhash_banded_table +
#: auto_band_bits2: per-band seeded 60-bit hash lanes (band b's lane is
#: the family hash64(token, seed=b), so band width is not capped by a
#: single-BIGINT fingerprint), probe-width vote keys, per-width
#: collision masses over DISTINCT buckets only, and the integer budget
#: scan min{w: C(w) <= TAU*n} with the same [lo, w_probe] clamp and
#: empty-corpus behavior (generated width series LEFT JOIN masses, so a
#: width with no mass row counts as 0 and an over-budget-everywhere
#: corpus coalesces to w_probe).
_AUTO2_VOTE_SUMS = ",\n".join(
    f"sum(CASE WHEN (h>>{j})&1=1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(_AUTO2_W_PROBE)
)
_AUTO2_KEY = " + ".join(
    f"CASE WHEN s{j}>0 THEN (1::BIGINT<<{j}) ELSE 0::BIGINT END"
    for j in range(_AUTO2_W_PROBE)
)

_SIMHASH_AUTO2_SQL = f"""
WITH ex AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
  FROM documents),
hb AS (
  -- one independent hash lane PER BAND: hash64(token, seed=band)
  SELECT doc_id, bb.b,
         ('0x' || substring(md5(bb.b::VARCHAR || ':' || t), 1, 15))::BIGINT AS h
  FROM ex CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bb),
v AS (SELECT doc_id, b, {_AUTO2_VOTE_SUMS} FROM hb GROUP BY doc_id, b),
k0 AS (SELECT doc_id, b, ({_AUTO2_KEY})::BIGINT AS k FROM v),
allk AS (
  -- family contract: docs with no tokens key to all-zero bands
  SELECT d.doc_id, bb.b, coalesce(k0.k, 0)::BIGINT AS k
  FROM documents d CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bb
  LEFT JOIN k0 ON k0.doc_id = d.doc_id AND k0.b = bb.b),
cnt AS (SELECT b, k, count(*) AS c FROM allk GROUP BY b, k),
mass AS (
  SELECT w, sum(m * (m - 1) // 2) AS mass FROM (
    SELECT ws.w, b, k & ((1::BIGINT << ws.w) - 1) AS kk, sum(c) AS m
    FROM cnt CROSS JOIN (SELECT unnest(range({_AUTO2_LO}, {_AUTO2_W_PROBE + 1})) AS w) ws
    GROUP BY ws.w, b, kk)
  GROUP BY w),
dial AS (
  SELECT coalesce(min(ws.w), {_AUTO2_W_PROBE}) AS w
  FROM (SELECT unnest(range({_AUTO2_LO}, {_AUTO2_W_PROBE + 1})) AS w) ws
  LEFT JOIN mass ON mass.w = ws.w
  WHERE coalesce(mass.mass, 0) <= {_AUTO2_TAU} * (SELECT count(*) FROM documents)),
keys AS (
  SELECT doc_id,
         max(CASE WHEN b = 0 THEN k END) & ((1::BIGINT << (SELECT w FROM dial)) - 1) AS k0,
         max(CASE WHEN b = 1 THEN k END) & ((1::BIGINT << (SELECT w FROM dial)) - 1) AS k1,
         max(CASE WHEN b = 2 THEN k END) & ((1::BIGINT << (SELECT w FROM dial)) - 1) AS k2,
         max(CASE WHEN b = 3 THEN k END) & ((1::BIGINT << (SELECT w FROM dial)) - 1) AS k3
  FROM allk GROUP BY doc_id)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       (bit_count(xor(a.k0, b.k0)) + bit_count(xor(a.k1, b.k1))
        + bit_count(xor(a.k2, b.k2)) + bit_count(xor(a.k3, b.k3)))::INT AS hamming,
       (SELECT w FROM dial)::INT AS band_bits
FROM keys a JOIN keys b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.k0, b.k0)) + bit_count(xor(a.k1, b.k1))
      + bit_count(xor(a.k2, b.k2)) + bit_count(xor(a.k3, b.k3)) <= 3
"""


@register("dedup_simhash_pairs_auto2", _SIMHASH_AUTO2_SQL)
def dedup_simhash_pairs_auto2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at the duplication-aware BUDGET dial
    (r19) — the registration that closes the r18 ladder waiver: the
    band width is chosen as the narrowest w whose MEASURED banded
    collision mass C(w) fits 64 candidate pairs/doc (one linear
    aggregate over a probe-width fingerprint pass; see
    operators.dedup.simhash_pairs_auto2), so the candidate stage is
    bounded at tau*n on EVERY growth axis — copy-correlated corpora
    included, where the r18 count dial under-widens (its waived
    alpha_tail 1.50). Per-band seeded hash lanes lift the 4*w <= 63
    single-BIGINT cap (each band key is its own BIGINT, widths to 59);
    pigeonhole (4 bands > hamming 3) keeps the band join
    recall-lossless at any width, so the oracle is brute-force
    all-pairs hamming over the same derived-width keys — its own ground
    truth — after replicating the dial derivation in integer SQL.
    ``band_bits`` is emitted as a column so the driver's value hash
    checks the dial itself, not just the surviving pairs. Measured
    dials: sf0.001/sf0.01 -> 8, sf0.1 -> 16, scaled k=2..16 ->
    16/17/18/20 (per-doc candidate mass flat 43..56 where the count
    dial reads 490 rising to 697); ladder target alpha_tail <= 1.2
    UNWAIVED on the copy-correlated scaled axis."""
    return D.simhash_pairs_auto2(table(spark, sf_dir, "documents"))
