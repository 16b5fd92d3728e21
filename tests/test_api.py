from __future__ import annotations

import pytest

from trike_spark import api

SF_DIR = "/root/testdata/sf0.001"


def test_sql_over_views(spark):
    df = api.sql(spark, SF_DIR, "SELECT r_name FROM region ORDER BY r_name LIMIT 2")
    assert [r["r_name"] for r in df.collect()] == ["AFRICA", "AMERICA"]


def test_run_by_name(spark):
    df = api.run(spark, SF_DIR, "q5_revenue_by_nation")
    assert df.columns == ["n_name", "revenue"]


def test_run_unknown_name():
    with pytest.raises(KeyError):
        api.run(None, SF_DIR, "nope")


def test_catalog_has_docs():
    cat = api.catalog()
    assert len(cat) >= 75
    assert all(v for v in cat.values()), [k for k, v in cat.items() if not v]
