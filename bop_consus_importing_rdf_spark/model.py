"""Canonical schemas (SURVEY.md §1.4).

The reference keeps everything in an in-memory Jena ``Model`` (triple set,
``Flows.kt:26-27``) plus a JSON ``dataInfo`` envelope per dataset
(``ImportingRdfVerticle.kt:72-74``). Here the same information is columnar:
one row per RDF statement with lineage columns, so Catalyst can prune and
push down instead of materializing graphs per record.
"""

from __future__ import annotations

from pyspark.sql import types as T

# one row per RDF statement; replaces the Jena Model
TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_value", T.StringType(), False),
        # 'iri' | 'bnode' | 'literal'
        T.StructField("obj_kind", T.StringType(), False),
        T.StructField("obj_lang", T.StringType(), True),
        T.StructField("obj_datatype", T.StringType(), True),
        # lineage: which extracted dataset / source doc the stmt belongs to
        T.StructField("dataset_id", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
    ]
)

# primary input per BASELINE.json input_hint
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# per-dataset emission materialized as a table (ImportingRdfVerticle.kt:84-96)
DATASETS_SCHEMA = T.StructType(
    [
        T.StructField("identifier", T.StringType(), False),
        T.StructField("counter", T.LongType(), False),
        T.StructField("total", T.LongType(), False),
        T.StructField("catalogue", T.StringType(), True),
        T.StructField("nt_payload", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)

# trailing identifierList record (ImportingRdfVerticle.kt:72-79)
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("catalogue", T.StringType(), True),
        T.StructField("identifiers", T.ArrayType(T.StringType()), False),
        T.StructField("run_id", T.StringType(), True),
    ]
)

# per-partition stage metrics (plans/lineage.py); rows-in/out pairs are
# expressed as two stage rows (…/transcripts_in, …/triples_out) per bucket
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
    ]
)

# small broadcast dictionary for entity linking (FIXTURES.md §3)
ALIASES_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("entity_uri", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
    ]
)
