"""THE gate mirror: every declared query vs its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (row count + schema +
order-insensitive values); running it per-commit keeps the contract green.
"""

from __future__ import annotations

import pytest

from etl_rf_matrix_controller_spark.plans import registry
from tests.conftest import SF_DIR, assert_oracle_match

registry.load_all()

ORACLE_CHECKED = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, registry.ORACLES[name], name=name)


def test_rows_only_runs(spark):
    # Round 8 promoted the last two rows-only queries to full oracles:
    # an empty set here is the achievement, not a skip.  If a future
    # genuinely-non-SQL-expressible op lands without an oracle, this
    # keeps exercising it.
    for name in ROWS_ONLY:
        df = registry.QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
