"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship KG-construction query at sf0.001.
``queries()``: one entry per implemented operator (SURVEY.md §2 + north-rule
extension + training-data ops). ``oracle_sql()``: DuckDB-equivalent SQL for
every SQL-expressible query (24 of them) — engineered so both engines
produce byte-identical values (see bop_consus_importing_rdf_spark/oracle.py).
Queries without an oracle entry (iterative CC, LSH-ANN, the full
transcript pipeline) get the driver's rows-only check and are additionally
golden-tested in tests/.
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


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: the full transcript pipeline —
# fused Arrow-UDF extraction + composed canonicalization; its stages are
# individually oracle-checked via doc_mentions/doc_entity_links/
# doc_kg_triples/entity_canonical_map)
# ---------------------------------------------------------------------------

def _q_kg_transcripts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bop_consus_importing_rdf_spark.kg.pipeline import build_kg
    from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts

    t = synth_transcripts(spark, n_conv=40, seed=42)
    return build_kg(spark, t, alias_table(spark))["triples"]


_ROWS_ONLY = {
    "kg_transcripts_e2e": _q_kg_transcripts_e2e,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(SPARK_QUERIES)
    out.update(_ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
