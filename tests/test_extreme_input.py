"""Extreme-text/timestamp robustness (r15 hardening, fourth axis).

tools/make_extreme_sf.py injects the dirty values a 100 TB corpus serves
daily — empty strings, multibyte unicode (char-count != byte-count),
10k-char repetitive payloads, and 1901/2199 outlier timestamps. The r15
differential run found two classes:

CRASHES (fixed, pinned here): strict JSON parse failing the scan on a
malformed payload (f14_variant_extract → try_parse_json), partition-BY
values becoming multi-KB directory names that abort the writer (s16/s26
→ path-safety length filter, the bad-records posture), and Derby
truncation aborts on over-width strings (s9 → filter to the declared
VARCHAR width).

UNBOUNDED BLOW-UPS (guarded, pinned here): one corrupt outlier
timestamp inflates a per-key sequence grid to 10^8 rows — a cluster OOM
at scale, a multi-minute hang locally. resample_interpolate and
ts_missing_days now carry an in-plan raise_error span guard that fails
fast with the offending key instead of materializing it
(sql_recursive_cte's month walk is equivalently bounded by Spark's own
RECURSION_LEVEL_LIMIT — already a clean error, by design).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.make_extreme_sf import TABLES, mutate_table

FIXED_IN_R15 = [
    "f14_variant_extract",
    "f14_json_extract",
    "s16_partitioned_publish",
    "s26_dynamic_overwrite",
    "s9_jdbc_roundtrip",
]

# queries whose designed response to a corrupt outlier span is a clean
# raise_error (not a silent multi-hundred-million-row materialization)
GUARDED_FAIL_FAST = {
    "ts_resample_interp": "max_steps_per_key",
    "ts_missing_days": "corrupt outlier date",
}


@pytest.fixture(scope="module")
def extreme_sf(tmp_path_factory):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("extreme_sf"))
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        pq.write_table(
            mutate_table(os.path.join(src, f"{t}.parquet"), t),
            os.path.join(d, f"{t}.parquet"),
        )
    return d


@pytest.mark.parametrize("name", FIXED_IN_R15)
def test_query_executes_on_extreme_input(spark, extreme_sf, name):
    from __spark_entry__ import queries

    queries()[name](spark, extreme_sf).collect()


@pytest.mark.parametrize("name", sorted(GUARDED_FAIL_FAST))
def test_span_guard_fails_fast_with_diagnosable_error(spark, extreme_sf, name):
    from __spark_entry__ import queries

    with pytest.raises(Exception) as e:
        queries()[name](spark, extreme_sf).collect()
    assert GUARDED_FAIL_FAST[name] in str(e.value)


@pytest.mark.parametrize("name", sorted(GUARDED_FAIL_FAST))
def test_guarded_queries_still_pass_on_clean_input(spark, name):
    from __spark_entry__ import queries

    out = queries()[name](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0


# r17 extreme-determinism contracts (COVERAGE.md): the three converted
# conventions must VALUE-MATCH their oracles on extreme input — a
# reappearance in the extreme allowlist means a contract regressed.
R17_EXTREME_CONTRACTS = [
    "f_date_arith",        # DATE-projection month arithmetic
    "text_edit_distance",  # printable-ASCII-projection levenshtein
    "s24_blob_chunking",   # byte-boundary chunking via hex transport
    "s11_csv_roundtrip",   # lossless CSV dialect (quoteAll + \N null sentinel)
    "s25_xml_roundtrip",   # XML whitespace preservation on read
]


@pytest.mark.parametrize("name", R17_EXTREME_CONTRACTS)
def test_r17_contract_value_matches_oracle_on_extreme_input(
    spark, extreme_sf, name
):
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from tools.verify_oracle import row_key

    sdf = queries()[name](spark, extreme_sf)
    cols = sorted(sdf.columns)
    srows = sorted(row_key(tuple(r[c] for c in cols)) for r in sdf.collect())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{extreme_sf}/{t}.parquet'"
        )
    res = con.sql(oracle_sql()[name])
    dsort = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
    drows = sorted(
        row_key(tuple(row[i] for i in dsort)) for row in res.fetchall()
    )
    assert srows == drows
