"""operators.dedup — exact, MinHash-LSH, SimHash (SURVEY A3/A5)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datalake_imagenes_georreferenciadas_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_table,
    with_minhash,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark):
    df = _docs(spark, [(3, "same text"), (1, "same text"), (2, "other")])
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    assert out == {1: 2, 2: 1}  # representative is the smallest id


def test_exact_dedup_idempotent(spark):
    df = _docs(spark, [(1, "a"), (2, "a"), (3, "b")])
    once = exact_dedup(df)
    twice = exact_dedup(once.select(F.col("doc_id"), F.col("digest").alias("text")))
    assert twice.count() == once.count()


def test_minhash_signature_matches_naive(spark):
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import (
        _MINHASH_MOD,
        _minhash_coeffs,
    )

    text = "the quick brown fox jumps over the lazy dog"
    df = _docs(spark, [(1, text)])
    sig = minhash_signatures(df, num_hashes=4).collect()[0]["__sig"]
    toks = text.lower().split()
    sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    coeffs = _minhash_coeffs(4)
    for s, (a, b, c) in enumerate(coeffs):
        expected = min(
            (
                lambda h: (a * (h % 2**30) + b * (h >> 30) + c) % _MINHASH_MOD
            )(int(hashlib.md5(f"0:{g}".encode()).hexdigest()[:15], 16))
            for g in sh
        )
        assert sig[s] == expected


def test_minhash_short_doc_null_sig(spark):
    df = _docs(spark, [(1, "too short")])  # < 3 tokens → no shingles
    row = minhash_signatures(df).collect()[0]
    assert row["__sig"] is None
    bands = with_minhash(df).collect()[0]["__bands"]
    assert bands is None


def test_identical_docs_are_near_pairs(spark):
    t = "uno dos tres cuatro cinco seis siete ocho"
    df = _docs(spark, [(1, t), (2, t), (3, "totally different words here entirely now")])
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.9).collect()
    assert len(pairs) == 1
    assert (pairs[0]["a_id"], pairs[0]["b_id"], pairs[0]["jaccard"]) == (1, 2, 1.0)


def test_near_pairs_orders_ids(spark):
    t = "uno dos tres cuatro cinco"
    df = _docs(spark, [(9, t), (4, t)])
    p = minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()[0]
    assert p["a_id"] < p["b_id"]


def test_simhash_identical_equal_distinct_differ(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta iota kappa"),
        ],
    )
    fps = {r["doc_id"]: r["fp"] for r in simhash_table(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert all(0 <= v < 2**32 for v in fps.values())


def test_simhash_empty_text_is_zero(spark):
    df = _docs(spark, [(1, "")])
    assert simhash_table(df).collect()[0]["fp"] == 0


def test_ngram_jaccard_hot_shingle_cap(spark):
    """VERDICT r1 #5: a stop-phrase shingle shared by every doc must not
    pair the whole corpus. With the cap at 3 the universal shingle drops
    out of the index; only the genuinely-similar pair (same unique tail)
    survives."""
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import ngram_jaccard_pairs

    stop = "lorem ipsum dolor"  # one 3-shingle shared by ALL docs
    rows = [(i, f"{stop} unique{i} tail{i} end{i}") for i in range(8)]
    rows += [(100, f"{stop} same same same"), (101, f"{stop} same same same")]
    df = _docs(spark, rows)

    uncapped = ngram_jaccard_pairs(df, k=3, jaccard_threshold=0.01).collect()
    capped = ngram_jaccard_pairs(
        df, k=3, jaccard_threshold=0.01, max_doc_freq=3
    ).collect()
    # uncapped: every pair shares the stop shingle → C(10,2)=45 candidates
    assert len(uncapped) == 45
    # capped: only the true near-dup pair survives, at full similarity
    assert len(capped) == 1
    got = capped[0]
    assert (got["a_id"], got["b_id"], got["jaccard"]) == (100, 101, 1.0)


def test_ngram_jaccard_cap_keeps_moderate_shingles(spark):
    """Shingles at or below the cap stay: df == cap is NOT dropped."""
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(1, "a b c x y z"), (2, "a b c p q r")]  # share shingle 'a b c', df=2
    out = ngram_jaccard_pairs(
        _docs(spark, rows), k=3, jaccard_threshold=0.0, max_doc_freq=2
    ).collect()
    assert len(out) == 1 and out[0]["jaccard"] == round(1 / 7, 6)


def test_dedup_components_transitive_closure(spark):
    """A~B and B~C near-dup (but A and C share less) must land in ONE
    component labelled by the min id — the transitive step pairwise
    output can't express."""
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import dedup_components

    # chain fixture chosen so BOTH adjacent pairs band-collide under the
    # deterministic md5 hash family (verified against a pure-python
    # replica) with jaccard 0.6, while the 1-3 overlap (0.333) falls
    # below the 0.45 verify threshold — so 1 and 3 connect ONLY through 2
    rows = [
        (1, "beta gamma psi mu zeta kappa iota eta omega tau lam chi rho xi"),
        (2, "beta gamma psi mu zeta kappa iota eta omega tau lam pi ups omicron"),
        (3, "nu theta phi mu zeta kappa iota eta omega tau lam pi ups omicron"),
        (9, "totally unrelated words only here now"),
    ]
    out = {
        r["doc_id"]: r["component"]
        for r in dedup_components(
            _docs(spark, rows), k=3, num_hashes=16, bands=8, jaccard_threshold=0.45
        ).collect()
    }
    assert out[1] == out[2] == out[3] == 1  # one cluster, min-id label
    assert out[9] == 9  # isolated doc is its own component


def test_dedup_components_paths_agree(spark):
    """The driver-side union-find (small graphs) and the distributed
    label-propagation loop (forced via small_graph_threshold=0) must
    produce identical components."""
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import dedup_components

    rows = [
        (1, "beta gamma psi mu zeta kappa iota eta omega tau lam chi rho xi"),
        (2, "beta gamma psi mu zeta kappa iota eta omega tau lam pi ups omicron"),
        (3, "nu theta phi mu zeta kappa iota eta omega tau lam pi ups omicron"),
        (9, "totally unrelated words only here now"),
    ]
    kw = dict(k=3, num_hashes=16, bands=8, jaccard_threshold=0.45)
    small = {
        r["doc_id"]: r["component"]
        for r in dedup_components(_docs(spark, rows), **kw).collect()
    }
    dist = {
        r["doc_id"]: r["component"]
        for r in dedup_components(
            _docs(spark, rows), small_graph_threshold=0, **kw
        ).collect()
    }
    assert small == dist == {1: 1, 2: 1, 3: 1, 9: 9}


def test_incremental_pairs_skip_corpus_internal(spark):
    """new_from: corpus-internal pairs (both ids below the split) are never
    generated; cross-boundary and new-new pairs match the full run."""
    t1 = "uno dos tres cuatro cinco seis siete ocho"
    t2 = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [
            (1, t1),  # corpus
            (2, t1),  # corpus dup of 1 — must NOT pair incrementally
            (10, t1),  # new dup of the corpus — cross pair
            (11, t2),  # new
            (12, t2),  # new dup of new — new-new pair
        ],
    )
    full = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.9).collect()
    }
    incr = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.9, new_from=10).collect()
    }
    assert (1, 2) in full and (1, 2) not in incr  # corpus-internal suppressed
    assert incr == {p for p in full if p[1] >= 10}  # everything else identical
    assert {(1, 10), (2, 10), (11, 12)} <= incr


def _py_components(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def test_components_from_edges_random_graphs_both_paths(spark):
    """components_from_edges: the driver union-find path and the
    distributed min-label-propagation path must both match a reference
    union-find on seeded random graphs (chains, cliques, isolates mix)."""
    import random

    from datalake_imagenes_georreferenciadas_spark.operators.dedup import components_from_edges

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        nodes = list(range(60))
        edges = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(45)]
        expect = _py_components(edges)
        edf = spark.createDataFrame(edges, "src long, dst long")
        for threshold in (10**6, 0):  # driver path, then distributed path
            got = {
                r["id"]: r["component"]
                for r in components_from_edges(
                    edf, small_graph_threshold=threshold
                ).collect()
            }
            assert got == expect, f"seed={seed} threshold={threshold}"


def test_components_threshold_boundary_and_default(spark):
    """VERDICT r4 #5: default threshold lowered 1M -> 250k for driver
    headroom, and the distributed path must actually activate the moment
    the edge count exceeds the threshold — equivalence parameterized
    ACROSS the boundary (threshold == n_edges takes the driver path,
    n_edges - 1 forces label propagation), identical results on both
    sides."""
    import inspect

    from datalake_imagenes_georreferenciadas_spark.operators.dedup import components_from_edges

    sig = inspect.signature(components_from_edges)
    assert sig.parameters["small_graph_threshold"].default == 250_000

    edges = [(i, i + 1) for i in range(40)]  # one 41-node chain
    expect = _py_components(edges)
    edf = spark.createDataFrame(edges, "src long, dst long")
    n = len(edges)
    results = {}
    for threshold in (n, n - 1):  # <= n: driver union-find; below: distributed
        # chain diameter = 40 > default max_iterations: raise it so the
        # label-propagation path fully converges on this worst-case shape
        out = components_from_edges(
            edf, max_iterations=64, small_graph_threshold=threshold
        )
        plan = out._jdf.queryExecution().analyzed().toString()
        if threshold >= n:
            # driver union-find output is broadcast-hinted for the
            # caller's join-back — the hint marks the path taken
            assert "strategy=broadcast" in plan, plan
        else:
            # distributed path returns the checkpointed label table
            # directly, no broadcast hint
            assert "strategy=broadcast" not in plan, plan
        results[threshold] = {
            r["id"]: r["component"] for r in out.collect()
        }
    assert results[n] == results[n - 1] == expect


def test_containment_catches_subset_that_jaccard_misses(spark):
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    # doc 2 is a verbatim excerpt of the much longer doc 1; doc 3 is
    # unrelated. Jaccard(1,2) is small (|A| >> |B|) but containment of
    # the excerpt in its source is ~1.
    long_doc = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(40, 60))
    other = " ".join(f"x{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, long_doc), (2, excerpt), (3, other)], "doc_id long, text string"
    )
    cont = {
        (r["a_id"], r["b_id"]): (r["cont_a"], r["cont_b"])
        for r in containment_pairs(df, k=3, threshold=0.8).collect()
    }
    assert (1, 2) in cont and len(cont) == 1
    ca, cb = cont[(1, 2)]
    # the excerpt (b, smaller) is fully contained; the source is not
    assert cb == 1.0 and ca < 0.2
    # symmetric Jaccard at the same bar finds nothing
    assert ngram_jaccard_pairs(df, k=3, jaccard_threshold=0.8).count() == 0


def test_simhash_pairs_parameter_validation(spark):
    """simhash_pairs enforces the pigeonhole precondition (bands >
    max_hamming), divisibility, and the 63-bit BIGINT-lane cap."""
    import pytest

    from datalake_imagenes_georreferenciadas_spark.operators import dedup as D

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.simhash_pairs(df, num_bits=32, band_bits=8, max_hamming=4)  # 4 bands !> 4
    with pytest.raises(ValueError):
        D.simhash_pairs(df, num_bits=32, band_bits=7)  # not divisible
    with pytest.raises(ValueError):
        D.simhash_pairs(df, num_bits=64, band_bits=16)  # sign-bit lane


def test_simhash_pairs_widened_bands_subset_of_registered(spark):
    """Band widening NARROWS the hamming bar (60-bit fp, same <=3):
    every 60/15 pair must also be a 32/8 pair-candidate's doc pair at
    some hamming — and on a corpus with exact duplicates, the widened
    setting still finds them (hamming 0 survives any band width)."""
    from datalake_imagenes_georreferenciadas_spark.operators import dedup as D

    rows = [(i, f"alpha beta gamma delta epsilon zeta {i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wide = {
        (r["a_id"], r["b_id"])
        for r in D.simhash_pairs(df, num_bits=60, band_bits=15).collect()
    }
    # identical texts (same i%5 bucket of 8 docs) → hamming 0 → found
    assert all((a % 5) == (b % 5) for a, b in wide)
    expected_dups = {(a, b) for a in range(40) for b in range(a + 1, 40) if a % 5 == b % 5}
    assert expected_dups <= wide
