"""Golden end-to-end gate (BASELINE.json metric): triple-set P/R ≥ 0.95
against the checked-in reference-form N-Triples output, exact manifest
equality, and per-turn text equality under stable ordering."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.functions.ntriples import nt_line
from bop_consus_importing_rdf_spark.kg.pipeline import build_kg
from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts

GOLDEN_DIR = Path(__file__).parent / "golden"
GOLDEN_N_CONV = 200
GOLDEN_SEED = 13


def test_golden_triples_precision_recall(spark):
    t = synth_transcripts(spark, n_conv=GOLDEN_N_CONV, seed=GOLDEN_SEED)
    out = build_kg(spark, t, alias_table(spark))
    got = {
        r.line
        for r in out["triples"]
        .select(
            nt_line(
                F.col("subj"), F.col("pred"), F.col("obj_value"),
                F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
            ).alias("line")
        )
        .collect()
    }
    golden = set(
        (GOLDEN_DIR / "golden_triples.nt").read_text(encoding="utf-8")
        .splitlines()
    )
    tp = len(got & golden)
    precision = tp / len(got)
    recall = tp / len(golden)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # deterministic pipeline on deterministic corpus: actually exact
    assert precision == 1.0 and recall == 1.0

    manifest = {
        r.catalogue: list(r.identifiers) for r in out["manifest"].collect()
    }
    golden_manifest = json.loads(
        (GOLDEN_DIR / "golden_manifest.json").read_text(encoding="utf-8")
    )
    assert manifest == golden_manifest


def test_per_turn_text_triples_exact(spark):
    """input_hint invariant: the kg:text triple of every turn equals the
    source text exactly, under stable (conv_id, turn_idx) ordering."""
    t = synth_transcripts(spark, n_conv=20, seed=GOLDEN_SEED)
    out = build_kg(spark, t, alias_table(spark))
    texts = (
        out["triples"]
        .filter(F.col("pred") == "urn:kg:pred:text")
        .select(
            F.regexp_extract("subj", r"urn:kg:turn:(.+):(\d+)$", 1).alias("conv_id"),
            F.regexp_extract("subj", r"urn:kg:turn:(.+):(\d+)$", 2)
            .cast("int").alias("turn_idx"),
            F.col("obj_value").alias("text_out"),
        )
    )
    joined = t.join(texts, ["conv_id", "turn_idx"])
    assert joined.count() == t.count()
    assert joined.filter(F.col("text") != F.col("text_out")).count() == 0
