"""Driver-contract smoke + a fast oracle-parity subset at sf0.001.

The full sweep runs via `python tools/check_oracles.py /root/testdata/sf0.01`;
here we keep a cheap always-on subset so regressions surface in pytest.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402

from tools.check_oracles import TABLES, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
FAST_SUBSET = [
    "ocr_extract_documents",
    "dedup_exact",
    "dedup_minhash",
    "similarity_cosine_topk",
    "text_stats",
    "rel_events_sessionize",
    "rel_aggregates",
]


def test_query_count_within_driver_cap():
    """The driver records correctness rows for at most 50 queries; a 51st
    entry silently loses its oracle check (round-5 blind spot)."""
    assert len(entry_mod.queries()) <= 50


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"conv_id", "turn_idx", "flat_text"}


def test_every_query_key_has_callable():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_oracle_parity_fast_subset(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: columns"
    assert value_hash(sdf) == value_hash(odf), f"{name}: value hash"
