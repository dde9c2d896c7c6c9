"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship KG-construction query at sf0.001.
``queries()``: one entry per implemented operator (SURVEY.md §2 + north-rule
extension + training-data ops). ``oracle_sql()``: DuckDB-equivalent SQL for
EVERY query — engineered so both engines produce byte-identical values
(see bop_consus_importing_rdf_spark/oracle.py), including the full
transcript pipeline (``kg_transcripts_e2e``: the whole build_kg DAG vs a
single DuckDB statement over the same Python-literal corpus).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bop_consus_importing_rdf_spark.oracle import (  # noqa: E402
    DOC_GAZETTEER,
    ORACLES,
    SPARK_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples extracted from the documents corpus at sf0.001
    (gazetteer mention detection → entity linking → N-Triples rendering)."""
    return SPARK_QUERIES["doc_kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
