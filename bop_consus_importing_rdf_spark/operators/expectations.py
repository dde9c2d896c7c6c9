"""Data-quality expectation checks (the pre-training validation gate).

A declarative rule set is evaluated in ONE pass over the table — every
rule compiles to a conditional count inside a single aggregation, so a
50-rule suite costs exactly one scan and one (single-row) reduce; only
uniqueness rules add a second combinable aggregation each. This is the
deequ/Great-Expectations-shaped gate (Schelter et al., *Automating
Large-Scale Data Quality Verification*, VLDB 2018) re-expressed as plain
Spark aggregates with a SQL twin, so the report itself is oracle-
checkable — a validation layer nobody can verify is no gate at all.

Rule forms (``rules`` is a list of tuples):

- ``("not_null", col)`` — violation: NULL cell;
- ``("non_empty", col)`` — violation: NULL or ``trim() == ''``;
- ``("unique", col)`` — violation: every row whose value occurs > 1×;
- ``("in_range", col, lo, hi)`` — violation: value outside [lo, hi]
  (NULL is not a violation — compose with not_null to require both);
- ``("matches", col, regex)`` — violation: non-NULL value not fully
  matching the (RE2-portable) regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMS = ("not_null", "non_empty", "unique", "in_range", "matches")


def _rule_name(rule: tuple) -> str:
    return f"{rule[0]}:{rule[1]}"


def validate_corpus(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate ``rules``; returns one row per rule:
    ``(rule, n_violations, n_rows, passed)``."""
    if not rules:
        raise ValueError("empty rule set")
    # Rule names key the report rows AND the internal aggregate aliases by
    # form:column only, so two same-form rules on one column (e.g. two
    # in_range bounds) would collide — the later F.col(name) select would
    # either raise an ambiguous-reference AnalysisException or silently
    # report one rule twice (ADVICE r5). The name format is part of the
    # report contract, so collisions are rejected loudly instead of
    # renamed.
    seen: set[str] = set()
    for rule in rules:
        name = _rule_name(rule)
        if name in seen:
            raise ValueError(
                f"duplicate rule {name!r}: two rules of the same form on "
                "the same column are ambiguous — combine them into one "
                "rule or validate a derived column"
            )
        seen.add(name)
    aggs = [F.count(F.lit(1)).alias("_n")]
    unique_rules: list[tuple] = []
    for rule in rules:
        form = rule[0]
        if form not in _FORMS:
            raise ValueError(f"unknown rule form {form!r}")
        name = _rule_name(rule)
        col = F.col(rule[1])
        if form == "not_null":
            bad = col.isNull()
        elif form == "non_empty":
            bad = col.isNull() | (F.trim(col) == "")
        elif form == "in_range":
            bad = col.isNotNull() & ((col < rule[2]) | (col > rule[3]))
        elif form == "matches":
            bad = col.isNotNull() & ~col.rlike(f"^(?:{rule[2]})$")
        else:  # unique — needs its own groupBy, handled below
            unique_rules.append(rule)
            continue
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(name)
        )
    base = df.agg(*aggs)
    parts = []
    row_expr = F.col("_n").cast("long")
    for rule in rules:
        if rule[0] == "unique":
            continue
        name = _rule_name(rule)
        parts.append(
            base.select(
                F.lit(name).alias("rule"),
                F.col(name).alias("n_violations"),
                row_expr.alias("n_rows"),
                (F.col(name) == 0).alias("passed"),
            )
        )
    for rule in unique_rules:
        name = _rule_name(rule)
        col = rule[1]
        # every member of a >1 group is a violation — combinable count
        viol = (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
                ).cast("long").alias("n_violations"),
                F.sum("_c").cast("long").alias("n_rows"),
            )
        )
        parts.append(
            viol.select(
                F.lit(name).alias("rule"),
                "n_violations",
                "n_rows",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
