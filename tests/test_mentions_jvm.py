"""JVM column-expression extraction == Arrow reference, row for row."""

from __future__ import annotations

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.kg.mentions import (
    extract_mentions_and_relations,
    extract_mentions_and_relations_arrow,
)
from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts


def test_jvm_extraction_matches_arrow_reference(spark):
    aliases = [r.alias for r in alias_table(spark).select("alias").distinct().collect()]
    t = synth_transcripts(spark, n_conv=60, seed=3)
    # adversarial extras: null text, empty, alias at string edges, template
    # with non-gazetteer slots, alias-prefix trap, unicode neighbours
    extra = spark.createDataFrame(
        [
            ("x", 0, "user", None, None, None),
            ("x", 1, "user", "", None, None),
            ("x", 2, "user", "Acme released Falcon in 1999", None, None),
            ("x", 3, "user", "NotAnOrg released Falcon in 1999", None, None),
            ("x", 4, "user", "Acme Corporation beats Acme", None, None),
            ("x", 5, "user", "naïveAcme is no mention but Acme is", None, None),
            ("x", 6, "user", "  Acme released The Falcon in 2001 \n\ttail", None, None),
            # raw \x01 bytes must not fabricate a relation (sentinel attack)
            ("x", 7, "user", "Acme\x01Org1 Corp\x01whatever", None, None),
            # \x01 in the swallowed tail of a REAL match is harmless
            ("x", 8, "user", "Acme released The Falcon in 2001 t\x01l", None, None),
            # \x01 inside a captured group → rejected by both engines
            ("x", 9, "user", "Acme released Org1\x01Corp in 2001", None, None),
            # Unicode-whitespace (NBSP) padding strips identically in both
            ("x", 10, "user", "Acme  released The Falcon in 2001", None, None),
            # non-ASCII year digits rejected by both (Java-\d semantics)
            ("x", 11, "user", "Acme released The Falcon in ٢٠٢٠", None, None),
            # line-terminator padding: Java's `.` excludes \r \u0085 \u2028
            # but the template is spelled [^\n] so BOTH engines match and
            # the WS-class strip removes the padding identically
            ("x", 12, "user", "\rAcme released The Falcon in 2001", None, None),
            ("x", 13, "user", "\u2028Acme released The Falcon in 2001", None, None),
            # a real newline before the template anchors ^ away -> no match
            # in either engine (non-multiline ^)
            ("x", 14, "user", "pad\nAcme released The Falcon in 2001", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = t.unionByName(extra)
    both = rows.select(
        "conv_id",
        "turn_idx",
        extract_mentions_and_relations(F.col("text"), aliases).alias("jvm"),
        extract_mentions_and_relations_arrow(F.col("text"), aliases).alias("ref"),
    )
    diff = both.filter(
        (F.col("jvm.mentions") != F.col("ref.mentions"))
        | ~(
            F.col("jvm.rel.subj_alias").eqNullSafe(F.col("ref.rel.subj_alias"))
            & F.col("jvm.rel.obj_alias").eqNullSafe(F.col("ref.rel.obj_alias"))
            & F.col("jvm.rel.year").eqNullSafe(F.col("ref.rel.year"))
        )
    )
    bad = diff.select("conv_id", "turn_idx", "jvm", "ref").collect()
    assert not bad, f"JVM/Arrow divergence: {bad[:5]}"
    # sanity: the adversarial rows behave as intended
    got = {
        r.turn_idx: (r.jvm.mentions, r.jvm.rel.subj_alias)
        for r in both.filter(F.col("conv_id") == "x").collect()
    }
    assert got[0] == ([], None) and got[1] == ([], None)
    assert got[2][1] == "Acme"
    assert got[3][1] is None                      # non-gazetteer subject
    assert got[4][0][0] == "Acme Corporation"     # longest-first wins
    assert got[5][0] == ["Acme"]                  # unicode-glued prefix ignored
    assert got[6] == (["Acme", "The Falcon"], "Acme")  # strip + tail
    assert got[7][1] is None   # raw \x01 fabricates nothing
    assert got[8][1] == "Acme"  # \x01 in the swallowed tail is harmless
    assert got[9][1] is None   # \x01 inside a group → no relation
    assert got[10][1] == "Acme"  # NBSP padding stripped in both engines
    assert got[11][1] is None  # non-ASCII digits are not a year
    assert got[12][1] == "Acme"  # \r padding matches + strips in both
    assert got[13][1] == "Acme"  # U+2028 padding matches + strips in both
    assert got[14][1] is None  # newline re-anchors ^ → no match in either
