#!/usr/bin/env python
"""Generate the golden corpus outputs (FIXTURES.md §4).

Run once; outputs are committed. The golden test recomputes the pipeline on
the same deterministic corpus and gates set-level precision/recall ≥ 0.95
(BASELINE.json metric) — in practice the rerun must be exactly 1.0/1.0.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.functions.ntriples import nt_line
from bop_consus_importing_rdf_spark.kg.pipeline import build_kg
from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts
from bop_consus_importing_rdf_spark.session import get_spark

GOLDEN_N_CONV = 200
GOLDEN_SEED = 13


def main() -> None:
    spark = get_spark("golden", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    t = synth_transcripts(spark, n_conv=GOLDEN_N_CONV, seed=GOLDEN_SEED)
    out = build_kg(spark, t, alias_table(spark))

    lines = sorted(
        r.line
        for r in out["triples"]
        .select(
            nt_line(
                F.col("subj"), F.col("pred"), F.col("obj_value"),
                F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
            ).alias("line")
        )
        .collect()
    )
    golden_dir = REPO / "tests" / "golden"
    golden_dir.mkdir(exist_ok=True)
    (golden_dir / "golden_triples.nt").write_text(
        "\n".join(lines) + "\n", encoding="utf-8"
    )

    mf = out["manifest"].collect()
    manifest = {r.catalogue: list(r.identifiers) for r in mf}
    (golden_dir / "golden_manifest.json").write_text(
        json.dumps(manifest, indent=1), encoding="utf-8"
    )
    print(f"golden: {len(lines)} triples, "
          f"{sum(len(v) for v in manifest.values())} manifest ids")


if __name__ == "__main__":
    main()
