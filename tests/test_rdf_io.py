"""S1/S3/S4/S5: gzip source read, pre-processing, N-Triples parse round-trip."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.functions.ntriples import nt_line
from bop_consus_importing_rdf_spark.sources.rdf_io import (
    parse_ntriples,
    pre_process,
    read_rdf_source,
)

from .conftest import triples_df

ROUNDTRIP_ROWS = [
    ("urn:s", "urn:p", "urn:o", "iri"),
    ("_:b0", "urn:p", "_:b1", "bnode"),
    ("urn:s", "urn:p", 'esc"ape\\me\nnow\ttab', "literal"),
    ("urn:s", "urn:p", "hallo", "literal", "de"),
    ("urn:s", "urn:p", "42", "literal", None,
     "http://www.w3.org/2001/XMLSchema#integer"),
    ("urn:s", "urn:p", "naïve ünïcode", "literal"),
]

KEY = ["subj", "pred", "obj_value", "obj_kind", "obj_lang", "obj_datatype"]


def _render(spark):
    df = triples_df(spark, ROUNDTRIP_ROWS)
    return df, df.select(
        nt_line(*[F.col(c) for c in KEY]).alias("value")
    )


def test_parse_render_roundtrip(spark):
    original, lines = _render(spark)
    parsed = parse_ntriples(lines)
    assert parsed.select(KEY).exceptAll(original.select(KEY)).count() == 0
    assert original.select(KEY).exceptAll(parsed.select(KEY)).count() == 0


def test_parse_skips_comments_blank_and_malformed(spark):
    lines = spark.createDataFrame(
        [("# comment",), ("",), ("  ",), ("not a triple at all",),
         ("<urn:s> <urn:p> <urn:o> .",)],
        "value string",
    )
    out = parse_ntriples(lines)
    assert out.count() == 1
    kept = parse_ntriples(lines, keep_malformed=True)
    assert kept.count() == 2  # malformed row retained with null kind
    assert kept.filter(F.col("obj_kind").isNull()).count() == 1


def test_raw_control_bytes_in_literals(spark):
    """Plain NT permits raw C0 controls in literal bodies; the JVM path's
    in-band sentinels must not corrupt or drop such lines (ADVICE r2)."""
    rows = [
        ('<urn:a> <urn:p> "a\x02b" .', ("urn:a", "a\x02b", "literal")),
        ('<urn:b> <urn:p> "a\x01b" .', ("urn:b", "a\x01b", "literal")),
        ('<urn:c> <urn:p> "\x01" .', ("urn:c", "\x01", "literal")),
        ('<urn:d> <urn:p> "mix\x01\\n\x02\\u00e9" .',
         ("urn:d", "mix\x01\n\x02é", "literal")),
        # escaped backslash before 'u' routes to Python (contains "\\u")
        # but must decode to a literal backslash + u, NOT an escape
        ('<urn:e> <urn:p> "a\\\\unchanged" .',
         ("urn:e", "a\\unchanged", "literal")),
        # 8-hex \U form (astral plane)
        ('<urn:f> <urn:p> "\\U0001F600" .',
         ("urn:f", "\U0001F600", "literal")),
    ]
    lines = spark.createDataFrame([(r[0],) for r in rows], "value string")
    got = {
        r.subj: (r.subj, r.obj_value, r.obj_kind)
        for r in parse_ntriples(lines).collect()
    }
    assert len(got) == len(rows)
    for _, expect in rows:
        assert got[expect[0]] == expect
    # a malformed line carrying \x01 still lands in the malformed bucket
    bad = spark.createDataFrame([("not a triple \x01 at all",)], "value string")
    kept = parse_ntriples(bad, keep_malformed=True).collect()
    assert len(kept) == 1 and kept[0].obj_kind is None
    assert kept[0].obj_value == "not a triple \x01 at all"


def test_gzip_source_transparent(spark, tmp_path):
    p = tmp_path / "doc.nt.gz"
    with gzip.open(p, "wt") as f:
        f.write('<urn:a> <urn:p> "x" .\n<urn:b> <urn:p> <urn:c> .\n')
    df = read_rdf_source(spark, str(p))
    parsed = parse_ntriples(df)
    assert parsed.count() == 2
    assert {r.subj for r in parsed.collect()} == {"urn:a", "urn:b"}


def test_pre_process_fixes(spark):
    lines = spark.createDataFrame(
        [("﻿<urn:a b c> <urn:p> \x01\"v\" .",)], "value string"
    )
    fixed = lines.select(pre_process(F.col("value")).alias("value"))
    got = fixed.collect()[0].value
    assert got == '<urn:a%20b%20c> <urn:p> "v" .'


def test_materialize_folds_fanout_single_checkpoint(spark):
    """r5 review finding 6: a risky NARROW producer (mapInPandas output at
    the document partitioning) is repartitioned to the session parallelism
    INSIDE the entry materialization — one repartition().localCheckpoint()
    instead of checkpoint + fan-out re-checkpoint (the full line stream
    previously serialized to block storage twice back-to-back)."""
    from bop_consus_importing_rdf_spark.operators.parallelism import (
        ensure_min_parallelism,
    )
    from bop_consus_importing_rdf_spark.sources.rdf_io import (
        ensure_materialized,
    )

    def gen(batches):
        for pdf in batches:
            yield pdf

    narrow = (
        spark.createDataFrame([("x",)], "value string")
        .coalesce(1)
        .mapInPandas(gen, "value string")
    )
    mat = ensure_materialized(narrow)
    target = spark.sparkContext.defaultParallelism
    # materialized once, already at session parallelism
    assert mat.rdd.getNumPartitions() >= target
    # ... so the parse fan-out guard provably no-ops (no second copy)
    assert ensure_min_parallelism(mat, multiplier=8.0) is mat
    # wide-enough or clean plans still pass through untouched
    clean = spark.range(10).selectExpr("cast(id as string) as value")
    assert ensure_materialized(clean) is clean
