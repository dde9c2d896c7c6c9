"""Data-quality expectation gate: every rule form on adversarial rows."""

from __future__ import annotations

import pytest

from bop_consus_importing_rdf_spark.operators.expectations import (
    validate_corpus,
)


def test_validate_corpus_all_forms(spark):
    rows = [
        (1, "hello", 5.0, "en"),
        (2, "  ", 12.0, "de"),       # empty-after-trim text; value too big
        (2, None, -1.0, "EN"),       # dup id; null text; value too small;
                                     # lang fails [a-z]{2}
        (None, "ok", None, "fr"),    # null id; null value (NOT a range
                                     # violation)
    ]
    df = spark.createDataFrame(
        rows, "id long, text string, value double, lang string"
    )
    out = {
        r["rule"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in validate_corpus(
            df,
            [
                ("not_null", "id"),
                ("unique", "id"),
                ("non_empty", "text"),
                ("in_range", "value", 0.0, 10.0),
                ("matches", "lang", "[a-z]{2}"),
            ],
        ).collect()
    }
    assert out == {
        "not_null:id": (1, 4, False),
        "unique:id": (2, 4, False),     # both members of the dup group
        "non_empty:text": (2, 4, False),
        "in_range:value": (2, 4, False),
        "matches:lang": (1, 4, False),
    }
    # all-green suite on the clean subset
    clean = df.filter("id = 1")
    assert all(
        r["passed"]
        for r in validate_corpus(
            clean, [("not_null", "id"), ("unique", "id")]
        ).collect()
    )


def test_validate_corpus_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="empty rule set"):
        validate_corpus(df, [])
    with pytest.raises(ValueError, match="unknown rule form"):
        validate_corpus(df, [("positive", "id")])


def test_validate_corpus_rejects_duplicate_rule_names(spark):
    """ADVICE r5: two same-form rules on one column collide on the
    generated aggregate alias — rejected loudly, never silently
    double-reported."""
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="duplicate rule"):
        validate_corpus(df, [("in_range", "id", 0, 5), ("in_range", "id", 2, 9)])
