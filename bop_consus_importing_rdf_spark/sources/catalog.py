"""Table catalog (reference S1/S2 analog).

The reference opens a source address as a local file with a hardcoded
content type (``Flows.kt:47-63``); our "address" is a table name resolved
against a scale-factor directory (driver testdata) or, in production, an
Iceberg catalog. Iceberg is gated behind import-try — the sandbox image has
no Iceberg jars, so parquet paths emulate table identity; the reader API is
the only thing the rest of the code sees either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver-provided table; validates the name (S2 gate analog)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
