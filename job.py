#!/usr/bin/env python
"""spark-submit entry point (north rule: ``spark-submit --py-files``).

    zip -r pipeline.zip bop_consus_importing_rdf_spark
    spark-submit --py-files pipeline.zip job.py \
        --transcripts <parquet path or table> \
        --aliases <parquet path>             \
        --output /data/kg_out --catalogue my-corpus --n-buckets 64

Replaces the reference's ``POST /pipe`` ingress (``ImportingRdfVerticle``):
the pipe config surface (catalogue, removePrefix, precedenceUriRef,
outputFormat fixed to N-Triples) becomes CLI flags; the run is resumable
from the last committed conversation bucket.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)
# local-mode fallback so pandas-UDF workers can import the package without
# --py-files; on a cluster, --py-files pipeline.zip takes precedence
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=False, default=None,
                    help="parquet path of the transcripts table; omit to "
                         "run the deterministic synthetic corpus")
    ap.add_argument("--aliases", default=None,
                    help="parquet path of the alias gazetteer "
                         "(alias, entity_uri, prior); default: built-in")
    ap.add_argument("--output", required=True)
    ap.add_argument("--catalogue", default="transcripts")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--synth-conv", type=int, default=1000,
                    help="synthetic corpus size when --transcripts omitted")
    ap.add_argument("--emit-sft", default=None, metavar="PATH",
                    help="additionally write SFT training pairs "
                         "(context/response per assistant turn, "
                         "kg/pipeline.sft_examples) as parquet to PATH")
    ap.add_argument("--sft-context", type=int, default=4,
                    help="context turns per SFT example (--emit-sft)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit an existing session (with cluster-sized configs)
    # is picked up as-is; standalone local runs get the tuned factory
    # instead of the stock 200 shuffle partitions
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from bop_consus_importing_rdf_spark.session import get_spark

        spark = get_spark("kg-construct")
    spark.sparkContext.setLogLevel("WARN")

    from bop_consus_importing_rdf_spark.kg.synth import (
        alias_table,
        synth_transcripts,
    )
    from bop_consus_importing_rdf_spark.plans.resume import run_resumable

    # a path reads as parquet; a bare name resolves through the session
    # catalog (spark.table) — on a cluster with an Iceberg catalog
    # configured this is the north rule's Iceberg transcript table, and
    # snapshot isolation/time travel come from the catalog, not this job
    if args.transcripts is None:
        transcripts = synth_transcripts(spark, n_conv=args.synth_conv)
    elif "/" in args.transcripts or args.transcripts.endswith(".parquet"):
        transcripts = spark.read.parquet(args.transcripts)
    else:
        transcripts = spark.table(args.transcripts)
    aliases = (
        spark.read.parquet(args.aliases) if args.aliases else alias_table(spark)
    )

    t0 = time.perf_counter()
    n = run_resumable(
        spark, transcripts, aliases, args.output, n_buckets=args.n_buckets
    )
    print(
        f"run finished: {n} buckets committed in "
        f"{time.perf_counter() - t0:.1f}s → {args.output}"
    )

    if args.emit_sft:
        from bop_consus_importing_rdf_spark.kg.pipeline import sft_examples

        t1 = time.perf_counter()
        pairs = sft_examples(transcripts, k_context=args.sft_context)
        pairs.write.mode("overwrite").parquet(args.emit_sft)
        n_pairs = spark.read.parquet(args.emit_sft).count()
        print(
            f"sft pairs: {n_pairs} written in "
            f"{time.perf_counter() - t1:.1f}s → {args.emit_sft}"
        )


if __name__ == "__main__":
    main()
