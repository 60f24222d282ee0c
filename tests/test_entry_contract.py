"""Guards on the driver contract (__spark_entry__): every registered
query must run at sf0.001 and return a stable, non-degenerate schema;
every oracle key must reference a registered query."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    # the intentionally rows-only ops: minhash/simhash banding,
    # survivors, and ivf gained value-hash oracles (literal-fixture /
    # deterministic-centroid tricks); the engine-specific residues are
    # the xxhash64 fingerprint (md5 twin oracled), the lookaround
    # scrub chain (core chain oracled), and the zlib compression ratio
    # (bit-identical python-zlib pytest twin)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"fingerprint", "scrub_full", "compression_ratio"}


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_runs_at_smoke_scale(spark, name):
    df = E.queries()[name](spark, SF_SMOKE)
    assert len(df.schema.fields) > 0
    assert df.count() >= 0  # full evaluation, not just planning


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "keep" in df.columns
