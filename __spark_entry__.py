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
# rows-only queries (non-SQL-expressible: iterative fixpoints, LSH-ANN,
# SimHash bit arithmetic, the full transcript pipeline)
# ---------------------------------------------------------------------------

def _q_minhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bop_consus_importing_rdf_spark.operators.dedup import minhash_dedup
    from bop_consus_importing_rdf_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(docs, "doc_id", "text", shingle_n=5, k=8, bands=4,
                         threshold=0.6)


def _q_ann_rhp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.operators.similarity import rhp_ann_topk
    from bop_consus_importing_rdf_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return rhp_ann_topk(emb, queries_df, k=10, n_planes=16, bands=8, dim=64)


def _q_entity_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bop_consus_importing_rdf_spark.kg.pipeline import canonical_entity_map
    from bop_consus_importing_rdf_spark.kg.synth import alias_table

    return canonical_entity_map(alias_table(spark))


def _q_kg_transcripts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bop_consus_importing_rdf_spark.kg.pipeline import build_kg
    from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts

    t = synth_transcripts(spark, n_conv=40, seed=42)
    return build_kg(spark, t, alias_table(spark))["triples"]


_ROWS_ONLY = {
    "minhash_dedup_docs": _q_minhash_dedup_docs,
    "ann_rhp_topk": _q_ann_rhp_topk,
    "entity_canonical_map": _q_entity_canonical_map,
    "kg_transcripts_e2e": _q_kg_transcripts_e2e,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(SPARK_QUERIES)
    out.update(_ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
