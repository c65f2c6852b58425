"""Null-injected-input robustness (r15 hardening, second axis).

tools/make_null_fuzz_sf.py builds a deterministic ~3%-null copy of a
testdata dir; running the registry against it (differentially vs DuckDB
on the SAME mutated files) found 16 queries that CRASHED on dirty data
that a 100 TB corpus serves daily: Arrow kernels calling bytes()/len()/
np.dot on None, fixture writers encoding null payloads, KMeans fitting
null vectors, Derby binding NULL strings as CLOB, ANSI casts of '' from
concat_ws's null-skipping, pandas NaN→int casts. All 16 now execute
crash-free (and 15 of 16 value-match their oracles even on fuzzed
input). This suite pins exactly that: each previously-crashing query
EXECUTES on a nulled sf0.001 copy. Value parity on fuzzed data stays a
tool-level concern (tools/verify_oracle.py /tmp/<fuzz_dir>) — null
ordering conventions differ between engines on shapes the contract
never specified.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.make_null_fuzz_sf import TABLES, main as _unused_main  # noqa: F401
from tools.make_null_fuzz_sf import mutate_table

# The 16 queries the first r15 null-fuzz run crashed on (plus the pandas
# cosine twin found in the second pass). Keep in sync with the fix sites
# in plans/queries.py and sources/binary.py.
FIXED_IN_R15 = [
    "s22_orphan_files",
    "f20_ip_cidr",
    "multimodal_meta",
    "g2_cogroup_merge",
    "multimodal_scene_cuts",
    "multimodal_frames",
    "multimodal_resize",
    "f17_cosine_pandas",
    "s2_archive_extract",
    "f18_python_udtf",
    "multimodal_audio_features",
    "a4_pivot_dynamic",
    "pipeline_geo_ingest",
    "s2_7z_extract",
    "ann_ivf_kmeans",
    "s9_jdbc_roundtrip",
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_sf"))
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        out = mutate_table(os.path.join(src, f"{t}.parquet"), t, 0.03)
        pq.write_table(out, os.path.join(d, f"{t}.parquet"))
    return d


def test_fixture_actually_contains_nulls(null_sf):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{null_sf}/documents.parquet")
    assert any(t.column(i).null_count > 0 for i in range(t.num_columns))


@pytest.mark.parametrize("name", FIXED_IN_R15)
def test_query_executes_on_null_injected_input(spark, null_sf, name):
    from __spark_entry__ import queries

    queries()[name](spark, null_sf).collect()
