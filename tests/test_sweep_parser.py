"""Unit tests for the sweep's plan-text walker
(tools.singlepartition_sweep.fact_level_singlepartition).

Synthetic formatted-plan text, no Spark needed. The r09 ADVICE found a
false negative: the walk broke out of the whole subtree at the FIRST
barrier node in line order, so a SinglePartition exchange above a
multi-child node (sort over a join of an aggregated branch and a
raw-scan branch) never saw the sibling branch's Scan. The walker now
tracks the barrier per-branch: a barrier shields only lines MORE
indented than itself.

Plan text mirrors Spark 4.1.2 ``explain("formatted")``: a tree chunk,
then ``\\n\\n``-separated per-node blocks (no codegen ``*`` markers —
formatted mode under AQE prints bare operator names).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from tools.singlepartition_sweep import fact_level_singlepartition


def _plan(tree: str, *blocks: str) -> str:
    return tree + "\n\n" + "\n\n".join(blocks)


SP_BLOCK = "({}) Exchange\nArguments: SinglePartition, ENSURE_REQUIREMENTS"


def test_direct_scan_is_flagged():
    plan = _plan(
        """== Physical Plan ==
Sort (3)
+- Exchange (2)
   +- Scan parquet  (1)""",
        SP_BLOCK.format(2),
    )
    assert fact_level_singlepartition(plan) == [2]


def test_aggregate_shields_its_subtree():
    plan = _plan(
        """== Physical Plan ==
Sort (5)
+- Exchange (4)
   +- HashAggregate (3)
      +- Exchange (2)
         +- Scan parquet  (1)""",
        SP_BLOCK.format(4),
    )
    assert fact_level_singlepartition(plan) == []


def test_multi_branch_sibling_scan_is_not_shielded():
    # THE r09 ADVICE case: branch 1 aggregated, branch 2 raw scan —
    # the old walker broke at HashAggregate(3) and never saw Scan(4).
    plan = _plan(
        """== Physical Plan ==
Sort (8)
+- Exchange (7)
   +- SortMergeJoin Inner (6)
      :- HashAggregate (3)
      :  +- Exchange (2)
      :     +- Scan parquet  (1)
      +- Filter (5)
         +- Scan parquet  (4)""",
        SP_BLOCK.format(7),
    )
    assert fact_level_singlepartition(plan) == [7]


def test_union_later_branch_scan_is_not_shielded():
    plan = _plan(
        """== Physical Plan ==
Window (9)
+- Sort (8)
   +- Exchange (7)
      +- Union (6)
         :- HashAggregate (3)
         :  +- Exchange (2)
         :     +- Scan parquet  (1)
         +- Project (5)
            +- Scan parquet  (4)""",
        SP_BLOCK.format(7),
    )
    assert fact_level_singlepartition(plan) == [7]


def test_scan_outside_exchange_subtree_is_ignored():
    # the raw scan lives in a SIBLING of the exchange, not under it
    plan = _plan(
        """== Physical Plan ==
Project (9)
+- BroadcastHashJoin Inner BuildRight (8)
   :- Exchange (4)
   :  +- HashAggregate (3)
   :     +- Exchange (2)
   :        +- Scan parquet  (1)
   +- BroadcastExchange (7)
      +- Filter (6)
         +- Scan parquet  (5)""",
        SP_BLOCK.format(4),
    )
    assert fact_level_singlepartition(plan) == []


def test_all_branches_aggregated_is_clean():
    plan = _plan(
        """== Physical Plan ==
Sort (10)
+- Exchange (9)
   +- SortMergeJoin Inner (8)
      :- HashAggregate (3)
      :  +- Exchange (2)
      :     +- Scan parquet  (1)
      +- HashAggregate (7)
         +- Exchange (6)
            +- Scan parquet  (5)""",
        SP_BLOCK.format(9),
    )
    assert fact_level_singlepartition(plan) == []


def test_non_singlepartition_exchange_is_ignored():
    plan = _plan(
        """== Physical Plan ==
Sort (3)
+- Exchange (2)
   +- Scan parquet  (1)""",
        "(2) Exchange\nArguments: hashpartitioning(k, 32), ENSURE_REQUIREMENTS",
    )
    assert fact_level_singlepartition(plan) == []

# ---- auto-pin checker (r10: registry-wide conservative plan pins) ----

from tools.singlepartition_sweep import check_auto_pin  # noqa: E402
from tools.auto_pins import AUTO_PINS, EXCLUDED  # noqa: E402

PIN_PLAN = """== Physical Plan ==
TakeOrderedAndProject (5)
+- HashAggregate (4)
   +- Exchange (3)
      +- HashAggregate (2)
         +- Scan parquet  (1)

(1) Scan parquet
Output [2]: [k#1, v#2L]
ReadSchema: struct<k:string,v:bigint>

(2) HashAggregate
Input [2]: [k#1, v#2L]
Keys [1]: [k#1]
Functions [1]: [partial_sum(v#2L)]
Results [2]: [k#1, sum#10L]

(3) Exchange
Input [2]: [k#1, sum#10L]
Arguments: hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS, [plan_id=7]

(4) HashAggregate
Input [2]: [k#1, sum#10L]
Keys [1]: [k#1]
Functions [1]: [sum(v#2L)]
Results [2]: [k#1, sum(v)#11L]

(5) TakeOrderedAndProject
Input [2]: [k#1, sum(v)#11L]
Arguments: 10, [k#1 ASC NULLS FIRST], [k#1, sum(v)#11L]"""


def _swap_op(plan: str, nid: int, old: str, new: str) -> str:
    """Rename node ``nid`` in BOTH representations of a formatted plan:
    the tree chunk (``OpName (N)``) and its detail block (``(N) OpName``).
    check_auto_pin reads op ids from the detail blocks only (op-ids-only
    matching, r11), so a tree-only rename would be invisible to it."""
    return plan.replace(f"{old} ({nid})", f"{new} ({nid})").replace(
        f"({nid}) {old}", f"({nid}) {new}"
    )


def test_pin_holds_on_designed_plan():
    assert check_auto_pin(
        PIN_PLAN, 1, ["!CartesianProduct", "HashAggregate", "TakeOrderedAndProject"]
    ) == []


def test_pin_catches_exchange_budget_overrun():
    probs = check_auto_pin(PIN_PLAN, 0, ["!CartesianProduct"])
    assert probs == ["exchanges=1 > pinned 0"]


def test_pin_catches_forbidden_node():
    plan = _swap_op(PIN_PLAN, 4, "HashAggregate", "CartesianProduct")
    assert any("CartesianProduct" in p for p in check_auto_pin(plan, 1, ["!CartesianProduct"]))


def test_pin_catches_missing_signature_node():
    plan = _swap_op(PIN_PLAN, 5, "TakeOrderedAndProject", "Project")
    assert check_auto_pin(plan, 1, ["TakeOrderedAndProject"]) == [
        "missing: TakeOrderedAndProject"
    ]


def test_pin_signature_matches_operator_id_not_substring():
    # "Window" inside a projected expression name must not satisfy a
    # Window-operator pin
    plan = PIN_PLAN.replace("Scan parquet  (1)", "Scan parquet window_col  (1)")
    assert "missing: Window" in check_auto_pin(plan, 1, ["Window"])


def test_no_duplicate_keys_in_pin_dicts():
    """A duplicate dict-literal key silently drops the earlier pin (r10
    VERDICT: a weaker second "ann_pq_topk" entry shadowed the stricter
    WindowGroupLimit pin for two rounds). Assert uniqueness on the AST of
    every pin dict so the class can't recur."""
    import ast

    for path, dict_name in [
        ("/root/repo/tools/explain_audit.py", "AUDITS"),
        ("/root/repo/tools/auto_pins.py", "AUTO_PINS"),
    ]:
        tree = ast.parse(open(path).read())
        found = False
        for node in ast.walk(tree):
            if not isinstance(node, (ast.Assign, ast.AnnAssign)):
                continue
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            if not any(isinstance(t, ast.Name) and t.id == dict_name for t in targets):
                continue
            value = node.value
            assert isinstance(value, ast.Dict), f"{dict_name} in {path} is not a dict literal"
            keys = [k.value for k in value.keys if isinstance(k, ast.Constant)]
            assert len(keys) == len(value.keys), f"non-literal key in {dict_name} ({path})"
            dupes = sorted({k for k in keys if keys.count(k) > 1})
            assert dupes == [], f"duplicate keys in {dict_name} ({path}): {dupes}"
            found = True
        assert found, f"{dict_name} assignment not found in {path}"


def test_every_registered_query_is_pinned_curated_or_excluded():
    """Full-registry pin coverage: each query has a curated explain audit,
    an auto pin, or a documented exclusion (streaming sink read-backs)."""
    import re as _re

    from datalake_imagenes_georreferenciadas_spark.plans.queries import all_queries

    curated = set(
        _re.findall(r'^\s{4}"([a-z0-9_]+)":', open("/root/repo/tools/explain_audit.py").read(), _re.M)
    )
    names = set(all_queries().keys())
    uncovered = names - curated - set(AUTO_PINS) - set(EXCLUDED)
    assert uncovered == set(), f"queries with no plan pin: {sorted(uncovered)}"
    assert not set(AUTO_PINS) & set(EXCLUDED)
    # a name in BOTH layers means a (usually weaker) auto pin shadows the
    # curated audit in review discussions — the r11/r12 ann_sq8_recall
    # duplicate. gen_auto_pins skips curated names, so any overlap is a
    # hand-edit or a stale regeneration; fail it outright.
    dup = set(AUTO_PINS) & curated
    assert dup == set(), f"auto pin duplicates curated audit: {sorted(dup)}"


# ---- wide-aggregate-buffer detector (r10: the a5 distinct-rewrite class) ----

from tools.singlepartition_sweep import wide_agg_results  # noqa: E402


def _agg_node(n_results: int, node_id: int = 2) -> str:
    cols = ", ".join(f"c{i}#1{i}L" for i in range(n_results))
    return f"({node_id}) HashAggregate\nInput [2]: [k#1, v#2L]\nKeys [1]: [k#1]\nResults [{n_results}]: [{cols}]"


def test_wide_agg_flags_expanded_sketch_buffer():
    # the a5 pathology: 412 columns of HLL register words per distinct pair
    plan = "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n" + _agg_node(412)
    assert wide_agg_results(plan) == [412]


def test_wide_agg_ignores_normal_aggregates():
    plan = "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n" + _agg_node(9)
    assert wide_agg_results(plan) == []


def test_wide_agg_only_matches_hashaggregate_results():
    # a wide Project/Scan output is not an aggregate buffer
    plan = (
        "== Physical Plan ==\nProject (2)\n+- Scan parquet  (1)\n\n"
        "(2) Project\nOutput [412]: [" + ", ".join(f"c{i}#1" for i in range(412)) + "]"
    )
    assert wide_agg_results(plan) == []


def test_wide_agg_sees_results_beyond_any_char_window():
    # the r10-advisor miss: a merge-side aggregate's Results line sits
    # thousands of chars after the header (one partial function with a
    # long Functions / Aggregate Attributes list) — the old 400-char
    # window regex was blind to exactly this, the common fat-buffer shape
    funcs = ", ".join(f"partial_approx_count_distinct(v#{i})" for i in range(400))
    attrs = ", ".join(f"buf#{i}[0]" for i in range(400))
    cols = ", ".join(f"c{i}#1{i}" for i in range(412))
    blk = (
        "(2) HashAggregate\nInput [2]: [k#1, v#2L]\nKeys [1]: [k#1]\n"
        f"Functions [400]: [{funcs}]\nAggregate Attributes [400]: [{attrs}]\n"
        f"Results [412]: [{cols}]"
    )
    assert len(funcs) + len(attrs) > 5000  # the window the old regex couldn't span
    plan = "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n" + blk
    assert wide_agg_results(plan) == [412]


def test_wide_agg_covers_object_and_sort_aggregate_blocks():
    cols = ", ".join(f"c{i}#1{i}" for i in range(100))
    for op in ("ObjectHashAggregate", "SortAggregate"):
        blk = f"(2) {op}\nInput [2]: [k#1, v#2L]\nKeys [1]: [k#1]\nResults [100]: [{cols}]"
        plan = f"== Physical Plan ==\n{op} (2)\n+- Scan parquet  (1)\n\n" + blk
        assert wide_agg_results(plan) == [100], op


def test_pin_signature_rejects_operator_name_degradation():
    # the r10-advisor laxity: a pinned HashAggregate degrading to
    # SortAggregate, or a Window pin met by a WindowGroupLimit-only plan,
    # must FAIL — op-id match only, no raw-substring fallback
    plan = _swap_op(
        _swap_op(PIN_PLAN, 4, "HashAggregate", "SortAggregate"),
        2,
        "HashAggregate",
        "SortAggregate",
    )
    assert "missing: HashAggregate" in check_auto_pin(plan, 1, ["HashAggregate"])
    wgl_plan = _swap_op(PIN_PLAN, 4, "HashAggregate", "WindowGroupLimit")
    assert "missing: Window" in check_auto_pin(wgl_plan, 1, ["Window"])


def test_fact_level_detail_block_after_triple_newline_is_seen():
    # r12 ADVICE low: a triple-newline separator (e.g. before a
    # Subqueries section) leaves a leading "\n" on the next detail
    # block; without lstrip the SinglePartition Exchange block was
    # dropped from sp_ids — a false negative on a real scale-killer.
    tree = """== Physical Plan ==
Sort (3)
+- Exchange (2)
   +- Scan parquet  (1)"""
    plan = tree + "\n\n\n" + SP_BLOCK.format(2)  # note the TRIPLE newline
    assert fact_level_singlepartition(plan) == [2]


# ---- structural ALLOWED_WIDE waiver (r12 ADVICE medium) ----

from tools.singlepartition_sweep import wide_agg_key_violations  # noqa: E402


def _keyed_agg(n_results: int, keys: list) -> str:
    cols = ", ".join(f"c{i}#1{i}L" for i in range(n_results))
    klist = ", ".join(keys)
    return (
        f"(2) HashAggregate\nInput [2]: [k#1, v#2L]\n"
        f"Keys [{len(keys)}]: [{klist}]\nResults [{n_results}]: [{cols}]"
    )


def test_wide_waiver_holds_on_low_cardinality_key():
    # the adjudicated a5 shape: wide HLL buffer keyed SOLELY by
    # l_returnflag — the waiver's structural condition
    plan = (
        "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n"
        + _keyed_agg(412, ["l_returnflag#25"])
    )
    assert wide_agg_key_violations(plan, r"l_returnflag#\d+") == []


def test_wide_waiver_fails_on_regressed_per_pair_key():
    # THE regression the gate exists for: the same wide buffer keyed per
    # (l_returnflag, l_orderkey) PAIR — i.e. per ~every fact row. The
    # nominal (name-only) waiver passed this silently; the structural
    # check must name the offending key.
    plan = (
        "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n"
        + _keyed_agg(412, ["l_returnflag#25", "l_orderkey#11L"])
    )
    assert wide_agg_key_violations(plan, r"l_returnflag#\d+") == ["l_orderkey#11L"]


def test_wide_waiver_fails_on_keyless_global_buffer():
    cols = ", ".join(f"c{i}#1{i}L" for i in range(412))
    blk = f"(2) HashAggregate\nInput [2]: [k#1, v#2L]\nResults [412]: [{cols}]"
    plan = "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n" + blk
    assert wide_agg_key_violations(plan, r"l_returnflag#\d+") == ["<no-keys-line>"]


def test_wide_waiver_ignores_narrow_blocks():
    # narrow aggregates keyed on anything are not the waiver's business
    plan = (
        "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n"
        + _keyed_agg(9, ["l_orderkey#11L"])
    )
    assert wide_agg_key_violations(plan, r"l_returnflag#\d+") == []

def test_wide_waiver_keeps_comma_bearing_expression_key_whole():
    # r13 ADVICE #2: a grouping-key EXPRESSION containing commas —
    # CAST(x AS decimal(10,2)) — must stay ONE key for the waiver
    # pattern, not be split into fragments that each spuriously fail
    # fullmatch (false FLAG on a legitimately waived plan).
    expr = "cast(l_quantity#30 as decimal(10,2))"
    plan = (
        "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n"
        + _keyed_agg(412, [expr])
    )
    assert wide_agg_key_violations(plan, re.escape(expr)) == []
    # and a second top-level key alongside it is still split correctly
    plan2 = (
        "== Physical Plan ==\nHashAggregate (2)\n+- Scan parquet  (1)\n\n"
        + _keyed_agg(412, [expr, "l_orderkey#11L"])
    )
    assert wide_agg_key_violations(plan2, re.escape(expr)) == ["l_orderkey#11L"]


# ---- headline_remeasure ref-file shapes (r14) ----

def test_remeasure_load_ref_accepts_both_artifact_shapes(tmp_path):
    # the adjudication tool must read a driver BENCH_r*.json
    # (parsed.queries) AND a bench BENCH_DETAIL.json (queries_warm) —
    # extended-name re-measures compare against git-extracted details
    from tools.headline_remeasure import load_ref

    driver = tmp_path / "BENCH_rX.json"
    driver.write_text(
        '{"parsed": {"queries": {"q1": 0.5}}, "tail": ""}'
    )
    detail = tmp_path / "DETAIL.json"
    detail.write_text('{"queries_warm": {"q1": 0.4, "q2": 1.0}}')
    assert load_ref(str(driver)) == {"q1": 0.5}
    assert load_ref(str(detail)) == {"q1": 0.4, "q2": 1.0}


# ---- _split_top_level property (r14) ----

from hypothesis import given, strategies as st  # noqa: E402

# fragments with no commas/brackets at all
_plain = st.text(
    alphabet="abcxyz#0123_ .*", min_size=1, max_size=8
).map(str.strip).filter(bool)


def _wrap(inner: st.SearchStrategy) -> st.SearchStrategy:
    # a balanced-paren/bracket wrapper that may contain commas INSIDE —
    # these inner commas must never split the key
    return st.tuples(
        st.sampled_from(["()", "[]"]), st.lists(inner, min_size=1, max_size=3)
    ).map(lambda t: "f" + t[0][0] + ", ".join(t[1]) + t[0][1])


# keys: plain fragments or nested calls like f(a, g[b, c]) — any commas
# are strictly inside brackets, so each generated key is ONE key
_keys = st.recursive(_plain, _wrap, max_leaves=6)


@given(st.lists(_keys, min_size=1, max_size=5))
def test_split_top_level_roundtrips_bracketed_keys(keys):
    from tools.singlepartition_sweep import _split_top_level

    joined = ", ".join(keys)
    assert [p.strip() for p in _split_top_level(joined)] == keys


def test_split_top_level_clamps_negative_depth_on_stray_closer():
    # r14 ADVICE #4: a ')' inside a quoted literal drove depth to -1, so
    # every LATER top-level comma sat at depth -1 and stopped splitting —
    # keys after the stray closer silently merged (fail-safe: the merged
    # key fails the waiver fullmatch → false FLAG, never a false pass,
    # but the flag text was opaque). Clamped at 0, later commas split.
    from tools.singlepartition_sweep import _split_top_level

    parts = [p.strip() for p in _split_top_level("substr(s, ''), ')', a#1, b#2")]
    assert parts == ["substr(s, '')", "')'", "a#1", "b#2"]
    # balanced input is unaffected by the clamp
    assert _split_top_level("f(a, b), c") == ["f(a, b)", " c"]


# ---- headline_remeasure no-ref row (r14 ADVICE #3) ----


def test_remeasure_classify_reports_measured_name_missing_from_ref():
    # a measured name absent from the ref file must yield an explicit
    # no-ref row, not vanish from the table after its passes were spent
    from tools.headline_remeasure import classify

    ref = {"q1": 0.5, "q0": 0.0}
    assert classify("q1", 0.5, ref) == ("q1", 0.5, 0.5, 1.0, "ok")
    assert classify("q1", 1.0, ref)[4] == "SLOW"
    assert classify("q_ext", 0.7, ref) == ("q_ext", None, 0.7, None, "no-ref")
    assert classify("q0", 0.1, ref)[3] == float("inf")  # zero ref guarded
