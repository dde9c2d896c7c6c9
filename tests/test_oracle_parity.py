"""Local replica of the driver's correctness gate: every oracle-checked
query must match DuckDB on row count, column names, and values (exact —
the queries are engineered so both engines compute identical bytes).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from bop_consus_importing_rdf_spark.oracle import ORACLES, SPARK_QUERIES
from bop_consus_importing_rdf_spark.sources.catalog import TABLES

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_df = SPARK_QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = duck.sql(ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), name
    assert len(spark_df) == len(duck_df), (
        f"{name}: rows {len(spark_df)} vs {len(duck_df)}"
    )
    a, b = _normalize(spark_df), _normalize(duck_df)
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=True, obj=name
    )
