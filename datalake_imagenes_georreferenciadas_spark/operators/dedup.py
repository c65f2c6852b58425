"""Deduplication operators over document tables (SURVEY A3/A5, north star).

Five dedup families, all shuffle-conscious:

- exact: hash-groupBy on content digest — one shuffle, map-side partial agg.
- MinHash-LSH: shingle → minhash signature → band keys → equi-join on band
  → verify Jaccard. The band join turns the O(n²) similarity join into a
  shuffle-partitionable equi-join; at 100 TB the candidate set per band
  bucket stays small as long as bands×rows is tuned to the target
  threshold (standard s-curve tuning).
- SimHash: sign-aggregated token-hash fingerprint; near-dups share the
  fingerprint (or a banded prefix at scale).
- n-gram Jaccard: exact pairwise Jaccard on shingle sets, restricted to
  LSH candidates (never all-pairs).
- embedding cosine: see operators.similarity.

MinHash and SimHash are **explode → groupBy(min/sum)** plans rather than
nested higher-order expressions: one hash evaluation per (token, seed),
map-side partial aggregation, one shuffle on the doc id. The expression
formulation re-evaluates the tokenization subtree per lambda element
(projection collapse defeats CSE) — O(T²·seeds) per row, unusable beyond
toy sizes; the explode plan is also exactly the shape that scales on a
cluster.

Everything is built on the cross-engine md5 hash family
(functions.hashing), so each operator has a DuckDB-oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    hash64,
    lsh_bands,
    shingles,
    shingles_from_tokens,
    tokens,
)


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, __sh) one row per shingle — the shared hot path.

    Tokenizes ONCE per row and materializes the token array through a
    repartition exchange, so the shingle construction downstream reads an
    attribute instead of re-running the tokenizer per slice (3-4× saving),
    and all per-shingle work runs at full parallelism even when the input
    is a single parquet split.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    tk = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks")).repartition(
        n_part, F.col(id_col)
    )
    return tk.select(
        F.col(id_col), F.explode(shingles_from_tokens(F.col("__toks"), k)).alias("__sh")
    )


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


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int, int]]:
    """Per-seed affine coefficients (a, b, c), 30-bit, derived from md5 so
    they're reproducible in plain SQL text."""
    import hashlib

    out = []
    for s in range(num_hashes):
        d = hashlib.md5(f"minhash-coeff:{s}".encode()).hexdigest()
        out.append(
            (
                int(d[0:8], 16) % (2**30 - 1) + 1,
                int(d[8:16], 16) % (2**30 - 1) + 1,
                int(d[16:24], 16) % (2**30),
            )
        )
    return out


#: 2^60 — the base-hash range; all affine products stay under 2^61 < 2^63.
_MINHASH_MOD = 2**60


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    keep_shingles: bool = True,
) -> DataFrame:
    """(id, __shingles, __sig) via explode + grouped min per seed — or
    just (id, __sig) with ``keep_shingles=False``, which skips the
    shingle re-computation and the join entirely (the bands-only path).

    ONE md5 per shingle; the ``num_hashes`` hash family is derived from the
    base hash's 30-bit halves with per-seed affine coefficients
    (``(a*lo + b*hi + c) mod 2^60`` — exact int64 arithmetic, identical in
    Spark, DuckDB, and Python). 16 partial-aggregated mins; one shuffle on
    the doc id. Docs with fewer than k tokens get a null ``__sig``.
    """
    coeffs = _minhash_coeffs(num_hashes)
    base = df.select(F.col(id_col), shingles(F.col(text_col), k).alias("__shingles"))
    ex = _exploded_shingles(df, id_col, text_col, k)
    h = ex.select(
        F.col(id_col),
        (hash64(F.col("__sh"), seed=0) % F.lit(2**30)).alias("__lo"),
        F.shiftright(hash64(F.col("__sh"), seed=0), 30).alias("__hi"),
    )
    aggs = [
        F.min(
            (F.lit(a) * F.col("__lo") + F.lit(b) * F.col("__hi") + F.lit(c))
            % F.lit(_MINHASH_MOD)
        ).alias(f"__h{s}")
        for s, (a, b, c) in enumerate(coeffs)
    ]
    sig = (
        h.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__h{s}") for s in range(num_hashes)]).alias("__sig"),
        )
    )
    if not keep_shingles:
        # docs with <k tokens have no exploded rows → absent here, exactly
        # the null-__sig rows the joined variant would filter anyway
        return sig
    return base.join(sig, id_col, "left")


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    keep_shingles: bool = True,
) -> DataFrame:
    """Attach shingles, MinHash signature, and LSH band keys."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes, keep_shingles)
    return sigs.withColumn(
        "__bands",
        F.when(
            F.col("__sig").isNotNull(), lsh_bands(F.col("__sig"), bands, rows_per_band)
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    new_from: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact Jaccard verify.

    Plan shape: explode band keys → self equi-join on the band hash →
    distinct candidate pairs → verify with exact shingle-set Jaccard →
    threshold. The only shuffles are the band join and the distinct — no
    cross join anywhere.

    ``new_from`` makes the join INCREMENTAL: only pairs whose larger id is
    ≥ the split survive, i.e. new-batch×corpus and new×new — corpus-
    internal pairs (already emitted by previous runs) are never generated.
    Since ``a_id < b_id``, the predicate sits entirely on the probe side,
    so Catalyst pushes it below the band join: the corpus side stays a
    full index scan while the probe side shrinks to the new batch — the
    ingest-time dedup gate shape (hash the delta, probe the index).
    """
    sig = with_minhash(
        df, text_col, k, num_hashes, bands, id_col, keep_shingles=False
    ).select(F.col(id_col), F.explode(F.col("__bands")).alias("band"))
    left = sig.select(F.col(id_col).alias("a_id"), "band")
    right = sig.select(F.col(id_col).alias("b_id"), "band")
    if new_from is not None:
        right = right.filter(F.col("b_id") >= new_from)
    cand = (
        left.join(right, "band")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    # count-based exact-Jaccard verification: shingle arrays never cross a
    # shuffle — candidates join against the exploded DISTINCT shingle
    # rows, intersections counted, sizes joined in. The candidate set is
    # corpus-derived (band collisions grow ~N²/2^bits), so it carries NO
    # broadcast hint — AQE converts to broadcast at runtime iff it fits
    # (r07 VERDICT: a forced hint removes AQE's fallback and OOMs the
    # driver on a pathological corpus)
    ex = _exploded_shingles(df, id_col, text_col, k).distinct()
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("__n"))
    ex_a = ex.select(F.col(id_col).alias("a_id"), F.col("__sh"))
    ex_b = ex.select(F.col(id_col).alias("b_id"), F.col("__sh"))
    inter = (
        cand
        .join(ex_a, "a_id")
        .join(ex_b, ["b_id", "__sh"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("__inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / F.greatest(
                    (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
                    F.lit(1.0),
                ),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    jaccard_threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join (dedup family #4).

    Fully aggregative plan — no arrays cross the shuffle: explode DISTINCT
    shingles, self equi-join on the shingle (only docs sharing a shingle
    ever pair — a word-level inverted index), count intersections per
    pair, then ``|A∩B| / (|A|+|B|-|A∩B|)``.

    ``max_doc_freq`` is the hot-shingle guard for scale: shingles present
    in more than that many documents (stop-phrases) are anti-joined out of
    the inverted index BEFORE the self-join — one such key otherwise pairs
    every co-containing doc quadratically (df=1M docs → 5·10^11 candidate
    rows from a single shuffle key). Sizes are computed over the SAME
    capped index, so the Jaccard stays internally consistent on the
    reduced shingle universe (stop-shingles carry no signal for near-dup
    anyway). The hot-key list is a tiny aggregate — AQE broadcasts the
    anti-join side at runtime. ``None`` = exact, uncapped.
    """
    ex = _exploded_shingles(df, id_col, text_col, k).distinct()
    if max_doc_freq is not None:
        hot = (
            ex.groupBy("__sh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("__sh")
        )
        ex = ex.join(hot, "__sh", "left_anti")
    # r19 (guide §1.2 "don't compute things twice" / §2.4): the capped
    # inverted index feeds THREE plan branches (both self-join sides +
    # the per-doc sizes), and nothing dedupes the shared subtree — the
    # explode → distinct → DF-cap pipeline ran three times per query.
    # An eager localCheckpoint materializes it once; every branch reads
    # the checkpoint. Same rows, same jaccards (hash-verified); sf0.1
    # fresh pass 2.48 s → 1.65 s. At scale this is the staging a real
    # pipeline does anyway (the index is built once per corpus snapshot).
    # r20 adjudication (VERDICT item 1): the driver's r19 0.87× was host
    # noise — 3 interleaved fresh-cold-session rounds each measured the
    # checkpoint FASTER than the revert (1.68/1.83/1.98 s vs
    # 1.90/2.29/2.48 s isolated warm). KEPT.
    ex = ex.localCheckpoint(eager=True)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("__n"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "__sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(F.count("*").alias("__inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT join (Broder's containment
    coefficient): ``c(A→B) = |A∩B| / |A|`` — high when A is a subset of
    B even if B is much larger, which symmetric Jaccard misses entirely
    (a paragraph quoted inside a long page has Jaccard ≈ 0 but
    containment ≈ 1). The standard rule for dropping subsumed documents
    (quotes, boilerplate-wrapped reposts, truncated mirrors) from a
    pretraining corpus.

    Same fully-aggregative inverted-index plan as
    :func:`ngram_jaccard_pairs` (one intersection count per unordered
    pair, no arrays cross the shuffle, hot-shingle DF cap for scale);
    both directions are computed from the single count, and a pair is
    emitted when EITHER direction clears ``threshold``.
    """
    ex = _exploded_shingles(df, id_col, text_col, k).distinct()
    if max_doc_freq is not None:
        hot = (
            ex.groupBy("__sh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("__sh")
        )
        ex = ex.join(hot, "__sh", "left_anti")
    # r19: one materialization of the capped index for its three
    # consumers (see ngram_jaccard_pairs — identical rationale; r20
    # adjudication kept it on the same fresh-cold-session evidence,
    # 2/3 rounds faster with the checkpoint).
    ex = ex.localCheckpoint(eager=True)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("__n"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "__sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(F.count("*").alias("__inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "cont_a", F.round(F.col("__inter") / F.col("__na").cast("double"), 6)
        )
        .withColumn(
            "cont_b", F.round(F.col("__inter") / F.col("__nb").cast("double"), 6)
        )
        .filter(
            (F.col("cont_a") >= threshold) | (F.col("cont_b") >= threshold)
        )
        .select("a_id", "b_id", "cont_a", "cont_b")
    )


def dedup_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_iterations: int = 20,
    small_graph_threshold: int = 250_000,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash-LSH pair graph — the step that turns pairwise near-dups into
    keep-one-per-group dedup decisions (component = min doc id, the
    canonical representative).

    Hybrid execution, both paths deterministic and result-identical:

    - the verified pair set after LSH pruning + Jaccard verify is
      usually TINY relative to the corpus (near-dup rate ≪ 1). Below
      ``small_graph_threshold`` edges, a driver-side union-find resolves
      components exactly in one pass — no iterative jobs at all;
    - above it, iterative min-label propagation over edge-incident
      nodes only: each round one distributed join + groupBy, converged
      when the monotonically-decreasing label sum stops falling; rounds
      = cluster-graph diameter (near-cliques from the band join → tiny).
      ``localCheckpoint`` truncates lineage per round; at extreme scale
      swap for large-star/small-star contraction — same per-round shape.

    Isolated docs never enter either path — they join back as their own
    component at the end.

    Null-identity contract (r16): a document with a NULL id can't be
    clustered (it has no identity to label, and engines disagree on
    whether null rows group or join) — excluded here, mirrored by
    ``WHERE doc_id IS NOT NULL`` in every components oracle. Null-TEXT
    docs stay: they form no pairs and come out singleton components.
    """
    df = df.filter(F.col(id_col).isNotNull())
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, k, num_hashes, bands, jaccard_threshold
    )
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    labels = components_from_edges(edges, max_iterations, small_graph_threshold)
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(labels, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("component", F.col("id").cast("long")).alias("component"),
    )


def components_from_edges(
    edges: DataFrame,
    max_iterations: int = 20,
    small_graph_threshold: int = 250_000,
) -> DataFrame:
    """(id, component) min-label connected components for every
    edge-incident node of an (src, dst) edge list — the shared engine
    behind near-dup clustering and eps-connectivity spatial clustering.

    Hybrid execution, both paths deterministic and result-identical:
    below ``small_graph_threshold`` edges a driver-side union-find
    resolves components in one pass (edge lists after candidate pruning
    are tiny relative to the corpus; the 250k default bounds the collect
    to ~15-25 MB — safe headroom on a shared driver); above it, iterative
    min-label
    propagation over edge-incident nodes only — each round one
    distributed join + groupBy, converged when the monotonically-
    decreasing label sum stops falling (rounds = cluster diameter).
    ``localCheckpoint`` truncates lineage per round; at extreme scale
    swap for large-star/small-star contraction — same per-round shape.
    Nodes with no edges are absent from the result — callers left-join
    and coalesce to self-label.
    """
    spark = edges.sparkSession
    # r20 (guide §1.2 / §5): ONE action both decides the path and fetches
    # the small-graph edges — ``limit(threshold+1).collect()`` returns at
    # most threshold+1 rows (executeTake computes the final stage
    # incrementally), so the common sub-threshold case pays a single job
    # with NO persist/InMemoryRelation cycle (the r19 shape ran
    # persist + count + collect: two jobs plus a cache materialization).
    # The threshold is still decided by the DATA (row count), not a
    # config; an over-threshold graph costs one truncated probe job and
    # then persists for the iterative path exactly as before. Same-session
    # A/B (r20, min-of-3): dedup_components 3.19 → 2.23 s,
    # corpus_dedup_report 2.40 → 1.57, graph_incremental_components
    # 3.81 → 2.74, dedup_cluster_sizes 2.37 → 2.10, geo_cluster_eps
    # 1.13 → 1.02, dedup_minhash_accuracy 2.05 → 1.81,
    # pipeline_corpus_prep 3.74 → 3.29; hash-identical.
    probe = edges.limit(small_graph_threshold + 1).collect()
    if len(probe) <= small_graph_threshold:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in probe:
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the canonical label
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        comp_rows = [(int(x), int(find(x))) for x in parent]
        return F.broadcast(
            spark.createDataFrame(
                comp_rows or [(None, None)], "id long, component long"
            ).filter(F.col("id").isNotNull())
        )

    edges = edges.persist()
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id").cast("long"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iterations):
        prop = sym.join(labels, sym.src == labels.id).select(
            F.col("dst").alias("id"), "component"
        )
        labels = (
            labels.union(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        s = labels.agg(F.sum("component").alias("s")).collect()[0]["s"]
        if s == prev_sum:
            break
        prev_sum = s
    sym.unpersist()
    edges.unpersist()
    return labels


def simhash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 32,
) -> DataFrame:
    """(id, fp) SimHash fingerprints via explode + grouped bit votes.

    One md5 per token; ``num_bits`` partial-aggregated sign sums; one
    shuffle on the doc id. Docs with no tokens fingerprint to 0.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    ex = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    h = ex.select(F.col(id_col), hash64(F.col("__t"), seed=0).alias("__h"))
    # r19 (guide §1.2 per-task/driver work): the per-bit vote aggregates
    # and the fingerprint pack are parsed from SQL strings instead of
    # composed through ~10 py4j calls per bit — same expression nodes,
    # same results (hash-verified), ~1 s less driver time per query
    # construction at 32 bits (simhash_pairs fresh 2.76 s → 1.78 s; an
    # eager-checkpoint variant of the fingerprint table was also tried
    # and rejected — stats loss made the band self-join slower combined).
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(__h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"__b{b}")
        for b in range(num_bits)
    ]
    g = h.groupBy(id_col).agg(*votes)
    fp = F.expr(
        " + ".join(
            f"(CASE WHEN __b{b} > 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
            for b in range(num_bits)
        )
    )
    return (
        df.select(F.col(id_col))
        .join(g, id_col, "left")
        .select(F.col(id_col), F.coalesce(fp, F.lit(0).cast("bigint")).alias("fp"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs ``(a_id, b_id, hamming)`` with pigeonhole
    band blocking — the parameterized scale dial behind
    ``dedup_simhash_pairs``.

    The ``num_bits`` fingerprint splits into ``num_bits // band_bits``
    bands; by pigeonhole, any pair within hamming distance
    ``max_hamming`` (< number of bands) shares at least one whole band,
    so the band equi-join provably finds EVERY qualifying pair while
    candidates stay bucket-bounded. Each band has ``2^band_bits``
    buckets, so candidate generation does ~(n/2^band_bits)^2 *
    2^band_bits work per band — quadratic in n at FIXED ``band_bits``
    (true of every published LSH/banding system; the r16 scale ladder
    measured alpha_tail 1.47 at the registered 32/8 setting). The
    100 TB deployment holds per-bucket density constant by widening
    bands with log n: Manku et al.'s (WWW'07) web-scale setting is a
    64-bit fingerprint in 4 x 16-bit bands at the SAME hamming <= 3
    bar — band WIDTH, not band count, absorbs corpus growth (band
    count is pinned by the hamming budget). ``num_bits`` is capped at
    63 so every bit weight fits a positive BIGINT lane (the sign bit
    would need special-cased literals on both engines for zero
    informational gain).

    Defaults (32/8/3) are bit-identical to the registered query and
    its DuckDB oracle; SCALING.md's band-widening table is this
    function at (32,8) vs (60,15) on k-scaled corpora.
    """
    n_bands = num_bits // band_bits
    if num_bits % band_bits or n_bands <= max_hamming or num_bits > 63:
        raise ValueError(
            f"simhash_pairs: need band_bits | num_bits <= 63 and "
            f"bands > max_hamming (got {num_bits}/{band_bits}, "
            f"{n_bands} bands, hamming {max_hamming})"
        )
    fps = simhash_table(df, id_col=id_col, text_col=text_col, num_bits=num_bits)
    cand = simhash_band_candidates(
        fps, id_col=id_col, num_bits=num_bits, band_bits=band_bits
    )
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return cand.filter(hamming <= max_hamming).select(
        "a_id", "b_id", hamming.alias("hamming")
    )


#: auto-density calibration for :func:`simhash_pairs_auto` —
#: ``band_bits = ceil(log2 n) - _AUTO_BAND_C`` reproduces the registered
#: base setting (n=5,000 → 8, i.e. 32/8) and walks the same
#: +1-bit-per-doubling law SCALING.md's band-widening demo measured
#: (the demo's 60/15 is the k=16-matched point of the same curve).
#: Per-band candidate work at this density is ~n²/2^bits = n·2^c —
#: linear. ``hi`` is 15 because num_bits = 4·band_bits must stay ≤ 63
#: (bands are pinned at 4 by the hamming-3 pigeonhole budget; band
#: WIDTH absorbs corpus growth).
_AUTO_BAND_C = 5
_AUTO_BAND_LO = 6
_AUTO_BAND_HI = 15


def auto_band_bits(
    n: int,
    lo: int = _AUTO_BAND_LO,
    hi: int = _AUTO_BAND_HI,
    c: int = _AUTO_BAND_C,
) -> int:
    """Corpus-derived simhash band width: ``clamp(ceil(log2 n) - c, lo,
    hi)``. Integer-exact (``(n-1).bit_length()``; the oracle's DuckDB
    twin is ``length(bin(greatest(n,2)-1))``) so both engines agree at
    every boundary."""
    return max(lo, min(hi, (max(int(n), 2) - 1).bit_length() - c))


def simhash_pairs_auto(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """:func:`simhash_pairs` with ``band_bits`` (and therefore
    ``num_bits = 4·band_bits``) DERIVED from a cheap corpus ``count()``
    (r18) — the band-widening scale path made automatic: every corpus
    doubling widens bands one bit, holding per-bucket density (and so
    per-band join cost/row) constant. Ladder k=1..16: WAIVED on the
    copy-correlated scaled axis (alpha_tail 1.50 — make_scaled_sf's
    cross-copy token correlation grows candidates x2.42 per doubling
    while per-candidate cost stays flat x1.09; the same dial on a
    decorrelated control reads 0.49, tools/organic_growth_control.py).
    The unwaived auto rows are the cosine/semantic ones.

    The count contract is the TOTAL row count of ``df`` as given —
    mirrored by the oracle's ``count(*)`` scalar subquery, so the
    fingerprint width is bit-agreed between engines. The answer remains
    EXACT at the derived width: pigeonhole (4 bands > hamming 3) makes
    the band join recall-lossless, so the oracle is a brute-force
    all-pairs hamming filter over the same derived-width fingerprints —
    its own ground truth, like dedup_simhash_pairs_wide."""
    n = df.count()
    bb = auto_band_bits(n)
    return simhash_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        num_bits=4 * bb,
        band_bits=bb,
        max_hamming=max_hamming,
    )


def simhash_band_candidates(
    fps: DataFrame,
    id_col: str = "doc_id",
    num_bits: int = 32,
    band_bits: int = 8,
) -> DataFrame:
    """Candidate pairs ``(a_id, b_id, fa, fb)`` sharing at least one
    whole band of the fingerprint — the (only) stage of simhash dedup
    whose cost depends on bucket density, factored out so the scale
    demo (tools/simhash_band_demo.py) can count candidates at each
    band width. One equi-join on (band, band_key); never a cross join.
    """
    n_bands = num_bits // band_bits
    mask = (1 << band_bits) - 1
    bands = fps.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright("fp", band_bits * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("k"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "fp", F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))
    a = bands.select(
        F.col("b"), F.col("k"), F.col(id_col).alias("a_id"), F.col("fp").alias("fa")
    )
    b_ = bands.select(
        F.col("b"), F.col("k"), F.col(id_col).alias("b_id"), F.col("fp").alias("fb")
    )
    return (
        a.join(b_, ["b", "k"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "fa", "fb")
        .distinct()
    )


#: duplication-aware auto-density (r19) — the collision-BUDGET dial that
#: closes the r18 ladder waiver. The count dial (auto_band_bits) widens
#: one bit per corpus doubling, which holds per-bucket density constant
#: only for decorrelated growth; a copy-correlated corpus (the realistic
#: web case — and exactly what make_scaled_sf builds) densifies buckets
#: FASTER than n, so the count dial under-widens precisely when dedup
#: matters most (measured: candidates ×2.42 per doubling at the count
#: dial's widths). The budget dial instead MEASURES the banded collision
#: mass C(w) = Σ_{band,bucket} c·(c−1)/2 at every candidate width in one
#: linear aggregate over the probe fingerprints and picks the narrowest
#: width whose candidate mass fits a per-doc budget:
#:
#:     w* = min{ w ∈ [lo, W] : C(w) ≤ TAU·n }   (else W)
#:
#: C(w) is exactly the number of per-band candidate pairs the band
#: equi-join will generate, so the chosen dial bounds the candidate
#: stage at TAU·n pairs — linear BY CONSTRUCTION on every axis,
#: duplication included (measured per-doc mass at the chosen dial on the
#: copy-correlated k=1..16 rungs: 50/45/52/56/43 — flat, where the count
#: dial reads 490→697 rising). All quantities are integers (bucket
#: counts, c·(c−1)/2, TAU·n), so the DuckDB twin can never disagree.
_AUTO2_TAU = 64  # per-doc candidate-pair budget (pairs/doc at the dial)
_AUTO2_LO = 8
_AUTO2_W_PROBE = 24  # probe/maximum band width; 4 bands of ≤59 bits fit
_AUTO2_BANDS = 4  # pinned: bands > max_hamming 3 keeps pigeonhole exact


def simhash_banded_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = _AUTO2_W_PROBE,
    n_bands: int = _AUTO2_BANDS,
) -> DataFrame:
    """(id, ks: array<bigint> of ``n_bands`` band keys) seeded banded
    SimHash at ``band_bits`` — the probe family behind
    :func:`simhash_pairs_auto2`.

    Band ``b`` bit ``j`` is the sign of the token-vote sum over bit
    ``j`` of ``hash64(token, seed=b)`` — one independent 60-bit hash
    lane PER BAND, so band width is no longer capped by a single-BIGINT
    fingerprint (the auto/auto-wide family's 4·band_bits ≤ 63 limit):
    each band key has its own BIGINT, widths to 59 bits. Crucially the
    family is PREFIX-CONSISTENT in width — bit ``j`` depends only on
    hash bit ``j``, never on the width — so the key at width ``w`` is
    ``probe_key & (2^w − 1)`` and ONE probe-width pass serves every
    candidate width: the dial measurement, the band join, and the final
    hamming verify all read the same table. Docs with no tokens key to
    all-zero bands (the family's fp=0 contract).

    Plan: explode tokens ×``n_bands`` hash lanes, groupBy(id, band)
    with ``band_bits`` integer vote sums (map-side partial agg; the agg
    row is ~``band_bits``+2 columns — under the sweep's 64-col wide-agg
    gate, unlike a 4·``band_bits``-column single-agg formulation), then
    4→1 conditional-agg pivot to the array. Two key-partitioned
    shuffles of ≤ ``n_bands`` rows/doc; zero Python.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    ex = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    )
    lanes = ex.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        hash64(F.col("__t"), seed=b).alias("h"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bh"),
    ).select(F.col(id_col), F.col("bh.b").alias("b"), F.col("bh.h").alias("h"))
    # r19: votes + key pack parsed from SQL strings (same nodes, same
    # results — see simhash_table; at the 24-bit probe width the py4j
    # saving is ~3× the 32-bit case)
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"__s{j}")
        for j in range(band_bits)
    ]
    g = lanes.groupBy(id_col, "b").agg(*votes)
    key = F.expr(
        " + ".join(
            f"(CASE WHEN __s{j} > 0 THEN CAST({1 << j} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
            for j in range(band_bits)
        )
    )
    wide = g.select(F.col(id_col), F.col("b"), key.alias("k")).groupBy(id_col).agg(
        F.array(
            *[
                F.coalesce(
                    F.max(F.when(F.col("b") == b, F.col("k"))),
                    F.lit(0).cast("bigint"),
                )
                for b in range(n_bands)
            ]
        ).alias("ks")
    )
    zeros = F.array(*[F.lit(0).cast("bigint") for _ in range(n_bands)])
    return (
        df.select(F.col(id_col))
        .join(wide, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("ks"), zeros).alias("ks"))
    )


def simhash_collision_masses(
    banded: DataFrame,
    lo: int = _AUTO2_LO,
    w_probe: int = _AUTO2_W_PROBE,
    n_bands: int = _AUTO2_BANDS,
) -> dict[int, int]:
    """``{w: C(w)}`` banded collision mass at every candidate width from
    ONE pass over the probe keys: per-band bucket counts at full probe
    width (≤ ``n_bands`` rows/doc), then each distinct (band, key)
    count re-bucketed under every width's prefix mask — the second agg
    runs over DISTINCT KEYS only, so the explode-by-width blowup is
    bounded by distinct buckets, not docs. Integer throughout."""
    bands = banded.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("b"), F.col("ks")[b].alias("k"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bk")
    ).select(F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))
    cnt = bands.groupBy("b", "k").count()
    widths = cnt.select(
        "b",
        "count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("w"),
                        F.col("k")
                        .bitwiseAND(F.lit((1 << w) - 1).cast("bigint"))
                        .alias("kk"),
                    )
                    for w in range(lo, w_probe + 1)
                ]
            )
        ).alias("wk"),
    ).select(F.col("wk.w").alias("w"), "b", F.col("wk.kk").alias("kk"), "count")
    masses = (
        widths.groupBy("w", "b", "kk")
        .agg(F.sum("count").alias("m"))
        .groupBy("w")
        .agg(F.sum(F.expr("(m * (m - 1)) DIV 2")).alias("mass"))
        .collect()
    )
    return {int(r["w"]): int(r["mass"]) for r in masses}


def auto_band_bits2(
    masses: dict[int, int],
    n: int,
    tau: int = _AUTO2_TAU,
    lo: int = _AUTO2_LO,
    w_probe: int = _AUTO2_W_PROBE,
) -> int:
    """The budget dial: narrowest width whose measured candidate mass
    fits ``tau`` pairs/doc — ``min{w: C(w) ≤ tau·n}``, else ``w_probe``.
    C is non-increasing in w (wider prefixes only split buckets), so
    this is the unique budget-feasible minimum. A width with no mass
    row (empty corpus) counts as mass 0. DuckDB twin: generate_series
    over [lo, w_probe] LEFT JOIN the mass aggregate, min(w) filtered on
    the same integer inequality, coalesced to ``w_probe``."""
    for w in range(lo, w_probe + 1):
        if masses.get(w, 0) <= tau * n:
            return w
    return w_probe


def simhash_pairs_auto2(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    tau: int = _AUTO2_TAU,
    lo: int = _AUTO2_LO,
    w_probe: int = _AUTO2_W_PROBE,
) -> DataFrame:
    """SimHash near-dup pairs ``(a_id, b_id, hamming, band_bits)`` at
    the duplication-aware BUDGET dial (r19) — the fix for the one r18
    ladder waiver: where :func:`simhash_pairs_auto` derives band width
    from ``count()`` alone (blind to duplication, under-widening on
    copy-correlated corpora), this measures the actual banded collision
    mass C(w) at every width in one linear aggregate and picks the
    narrowest width whose candidate volume fits ``tau·n`` — so the
    candidate stage is ≤ ``tau`` pairs/doc BY CONSTRUCTION on every
    growth axis, correlated or not.

    Exactness: 4 bands > hamming 3, so pigeonhole makes the band join
    recall-lossless at ANY width — the oracle is brute-force all-pairs
    hamming over the same derived-width keys, its own ground truth. The
    answer (hamming ≤ 3 over 4·w* bits) is dial-dependent like the rest
    of the auto family; ``band_bits`` is emitted as a column so the
    oracle compare hashes the dial itself, not just the pairs.

    One probe-width fingerprint pass serves measurement AND answer
    (prefix consistency, see :func:`simhash_banded_table`); the dial is
    a 17-row driver-side reduce (same class as the family's ``count()``
    scalar). Degenerate corpora: an exact-duplicate mega-cluster never
    splits under ANY width, so the dial saturates at ``w_probe`` and
    the emitted pairs are the genuine hamming-0 output — quadratic in
    the cluster because the ANSWER is (collapse clusters with
    dedup_exact/components first; pipeline_corpus_prep stages exactly
    that). 100 TB posture: candidate join cost ``tau·n`` linear;
    fingerprint cost linear at FIXED probe width (96 hash+vote lanes);
    raise ``w_probe`` to 32 at ≳10^9 docs (one constant, the law is
    unchanged; per-band BIGINT keys carry widths to 59).
    """
    # materialize the probe keys ONCE (eager localCheckpoint, the
    # components_from_edges precedent): the dial's mass aggregate and
    # the final band join + hamming verify both read the checkpoint,
    # so the fingerprint job — the dominant linear stage at 100 TB —
    # really does run a single time, as the contract claims. Without
    # the barrier, lazy evaluation re-runs it per consumer.
    banded = simhash_banded_table(
        df, id_col=id_col, text_col=text_col, band_bits=w_probe
    ).localCheckpoint(eager=True)
    # same value as df.count() (the banded table left-joins back onto
    # df's id column, one row per input row) but reads the checkpoint
    # just materialized instead of re-scanning/re-computing df
    n = banded.count()
    w_star = auto_band_bits2(
        simhash_collision_masses(banded, lo=lo, w_probe=w_probe),
        n,
        tau=tau,
        lo=lo,
        w_probe=w_probe,
    )
    mask = F.lit((1 << w_star) - 1).cast("bigint")
    keyed = banded.select(
        id_col,
        F.transform(F.col("ks"), lambda k: k.bitwiseAND(mask)).alias("ks"),
    )
    bands = keyed.select(
        id_col,
        "ks",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("b"), F.col("ks")[b].alias("k"))
                    for b in range(_AUTO2_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "ks", F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))
    a = bands.select(
        "b", "k", F.col(id_col).alias("a_id"), F.col("ks").alias("ka")
    )
    b_ = bands.select(
        "b", "k", F.col(id_col).alias("b_id"), F.col("ks").alias("kb")
    )
    cand = (
        a.join(b_, ["b", "k"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "ka", "kb")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("ka"), F.col("kb"), lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return cand.filter(hamming <= max_hamming).select(
        "a_id",
        "b_id",
        hamming.alias("hamming"),
        F.lit(w_star).alias("band_bits"),
    )
