"""The DuckDB-oracle gate as a pytest: every oracle-checked registry
query must hash-match at sf0.001. This is the same comparison the
external driver runs at sf0.01 (tools/verify_oracle.py for the full
harness) — having it in pytest makes `pytest tests/` a complete
regression gate."""

import duckdb
import pytest

from arc_kinesis_tagging_spark.plans.registry import QUERIES
from arc_kinesis_tagging_spark.sources.tables import TABLES

import sys

sys.path.insert(0, "/root/repo")
from tools.verify_oracle import canon_rows, driver_canon_check  # noqa: E402

SF = "/root/testdata/sf0.001"
ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    q = QUERIES[name]
    sdf = q.builder(spark, SF).toPandas()
    # the external driver sorts raw cells; non-scalar outputs crash it
    driver_canon_check(sdf)
    scols, srows = canon_rows(sdf)
    ocols, orows = canon_rows(duck.execute(q.oracle).df())
    assert scols == ocols
    assert srows == orows
