"""Scale-ladder growth-exponent pins (r16, VERDICT task 2; SCALING.md).

scaling_ladder.json commits measured growth exponents for the most
expensive query families over deterministic k× inflations of sf0.1
(tools/make_scaled_sf.py — key spaces stretch with row count).
alpha_tail = log2(t[8]/t[4]) is the marginal exponent on the largest
doubling; a banded/bucketed design holds it ≲1.3, a pair generator
gone quadratic reads ≈2.

These tests pin the COMMITTED numbers (structure + gate + waiver set);
re-measuring is a tool-level act (`python tools/scaling_ladder.py`,
scoped runs merge). If a re-measure pushes a family over the gate,
either fix the plan or add a root-caused waiver in SCALING.md AND here.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LADDER_JSON = Path(__file__).resolve().parent.parent / "scaling_ladder.json"

ALPHA_TAIL_GATE = 1.35

# family -> why superlinear growth is accepted (full writeup: SCALING.md)
WAIVERS = {
    # fixed-parameter banded LSH is Θ(n²/2^p) by construction; the
    # 100 TB path scales planes_per_band ∝ log n — demonstrated in
    # SCALING.md (k=8 with p=8: ×4.9 cost for ×8 data vs ×25.6 at p=5)
    "dedup_semantic_components": "fixed-p LSH bucket density; p scales with log n at deployment (the 4x8 setting is REGISTERED as dedup_semantic_components_scaled, ladder alpha_tail 1.20 unwaived)",
    # the pair-generation stage of the same operator — identical
    # mechanism and identical demonstrated scale path
    "dedup_cosine_pairs": "fixed-p hyperplane-LSH bucket density (same as dedup_semantic_components; the 4x8 setting is REGISTERED as dedup_cosine_pairs_scaled, ladder alpha_tail 1.13 unwaived)",
    # SimHash pigeonhole bands have a fixed bucket space per band the
    # same way; the band-WIDENING scale path is demonstrated in
    # SCALING.md (r17: k=8 at 60-bit/15-bit-band = ×2.5 cost for ×8
    # data vs ×13.6 at the registered 32/8; tools/simhash_band_demo.py)
    "dedup_simhash_pairs": "fixed-width pigeonhole-band bucket density; band width scales with log n (demonstrated r17; the 60/15 setting is REGISTERED as dedup_simhash_pairs_wide, ladder alpha_tail 0.68 at its k=8 design density and 1.14 at k=16 — density-matched through k=16, under the gate at every measured point)",
    # the registered k=8-density-matched settings measured PAST their
    # design density: the k=16 segment re-enters the fixed-p quadratic
    # regime exactly as the law predicts (SCALING.md §registered
    # settings at k=16); the k=16-matched increment (planes=9) is
    # measured in the spot-check at x2.13 per doubling
    "dedup_cosine_pairs_scaled": "4x8 is density-matched FOR k=8 (alpha_tail 1.13 there, unwaived); the 8->16 segment reads 1.99 by the fixed-p law - planes=9 is the measured k=16 dial",
    "dedup_semantic_components_scaled": "same mechanism one stage later: 1.20 at its k=8 design density, 1.89 on the 8->16 segment; planes=9 is the measured k=16 dial",
    # NOT a dial failure — an AXIS property, decomposed by measurement
    # (r18, tools/organic_growth_control.py + SCALING.md §auto-density):
    # make_scaled_sf's every-3rd-word salting leaves TOKEN-VOTE simhash
    # fingerprints correlated across copies (it was calibrated for
    # 5-shingle jaccard, where salting kills 87% of shingles), so
    # cross-copy docs co-occupy band buckets: candidates grow x2.42 for
    # x2 docs (41.2M -> 99.7M at the derived 44/11 -> 48/12) while
    # per-candidate cost stays flat (x1.09) and TRUE pairs FALL (161k
    # -> 78k; the wider fingerprint discriminates more). On the
    # decorrelated control (every word salted: independent shards,
    # base-level internal correlation) the SAME auto dial reads
    # alpha_tail 0.49 with candidate growth x1.42 — the extra band bit
    # over-absorbs the doubling. Content that genuinely shares 2/3 of
    # its tokens SHOULD co-occupy bands; no density dial can (or
    # should) hide it, and pipeline_corpus_prep stages exact-dedup
    # before banding so production clusters shrink first.
    # r19: the waiver is CLOSED by dedup_simhash_pairs_auto2 — the
    # budget dial measures the collision mass itself, so it widens on
    # duplication the count dial cannot see (alpha_tail 0.40 UNWAIVED
    # on this same axis, pinned below). The count-dial row stays
    # waived-as-documented: its law is count-only by construction.
    "dedup_simhash_pairs_auto": "count-only dial cannot see copy-correlation (x2.42 candidates for x2 docs, per-candidate cost flat; decorrelated control 0.49); SUPERSEDED at scale by dedup_simhash_pairs_auto2's budget dial, unwaived on the same axis",
}


def _load():
    with open(LADDER_JSON) as fh:
        return json.load(fh)


def test_ladder_structure():
    data = _load()
    # k=16 extension points may append (r17 per-k merge); the base
    # ladder is always the {1,2,4,8} prefix
    assert data["ks"][:4] == [1, 2, 4, 8]
    fams = data["families"]
    assert len(fams) >= 20
    for name, rec in fams.items():
        assert set(rec["t"]) >= {"1", "2", "4", "8"}, name
        assert all(v > 0 for v in rec["t"].values()), name
        assert "alpha_tail" in rec and "alpha_fit" in rec, name


def test_every_family_is_registered():
    from __spark_entry__ import queries

    registry = set(queries())
    unknown = set(_load()["families"]) - registry
    assert not unknown, sorted(unknown)


def test_growth_exponents_within_gate_or_waived():
    fams = _load()["families"]
    over = {
        n: r["alpha_tail"]
        for n, r in fams.items()
        if r["alpha_tail"] > ALPHA_TAIL_GATE and n not in WAIVERS
    }
    assert not over, f"superlinear growth without a waiver: {over}"
    # waivers must still be present and genuinely over the gate —
    # a healed waiver should be deleted, not silently kept
    for n in WAIVERS:
        assert n in fams, f"waived family {n} missing from ladder"
        assert fams[n]["alpha_tail"] > ALPHA_TAIL_GATE, (
            f"{n} now within gate — remove its waiver"
        )


def test_core_families_covered():
    fams = set(_load()["families"])
    for required in (
        "dedup_near_pairs",
        "dedup_components",
        "ann_pq_topk",
        "graph_triangles",
        "er_fuzzy_match",
        "pipeline_corpus_prep",
        # r17: streaming composites — machinery cost, not data size,
        # dominates (alpha_tail 0.28-0.41 at 8x data; SCALING.md)
        "streaming_append_windows",
        "streaming_cdc_apply",
        "streaming_tdigest",
        # r19: the budget-dial registration that closes the simhash
        # auto waiver must keep its ladder row
        "dedup_simhash_pairs_auto2",
    ):
        assert required in fams, required


def test_budget_dial_row_is_unwaived_through_k16():
    """The r19 headline: dedup_simhash_pairs_auto2 must hold the gate
    WITHOUT a waiver on the copy-correlated scaled axis, k=16
    included — the exact axis and rung the r18 count dial was waived
    on (1.50). Committed: alpha_tail 0.40."""
    rec = _load()["families"]["dedup_simhash_pairs_auto2"]
    assert "16" in rec["t"], "k=16 rung missing"
    assert rec["alpha_tail"] <= ALPHA_TAIL_GATE
    assert "dedup_simhash_pairs_auto2" not in WAIVERS
