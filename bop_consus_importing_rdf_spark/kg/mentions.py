"""Batched mention detection over transcript text (north-rule stage).

Replaces the reference's RDF parse stage (``JenaUtils.read``, reference
``Flows.kt:66-77``) as the "unstructured bytes → graph statements" boundary:
here the unstructured input is conversation text and the parser is a
gazetteer matcher.

Arrow-batched ``pandas_udf`` throughout — the regex alternation is compiled
ONCE per executor (module-level cache keyed by the alias tuple), each batch
is matched with vectorized ``Series.str`` ops. No per-row Python, per the
``input_hint`` contract.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@lru_cache(maxsize=8)
def _compiled(aliases: tuple[str, ...]) -> re.Pattern:
    # longest-first so "Org4 Corporation" beats its prefix "Org4"
    parts = sorted(aliases, key=len, reverse=True)
    return re.compile(
        r"\b(" + "|".join(re.escape(a) for a in parts) + r")\b"
    )


_RELATION_TMPL = r"^(.*?) released (.*?) in (\d{4})"


def detect_mentions(text: Column, aliases: list[str]) -> Column:
    """``array<string>`` of gazetteer aliases found in each text, in order."""
    alias_key = tuple(sorted(aliases))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _detect(s: pd.Series) -> pd.Series:
        pat = _compiled(alias_key)
        return s.fillna("").str.findall(pat)

    return _detect(text)


def extract_mentions_and_relations(text: Column, aliases: list[str]) -> Column:
    """Fused extractor: ONE Arrow pass computing both the mention list and
    the template relation — halves the Python-worker transfer vs calling
    :func:`detect_mentions` and :func:`extract_relations` separately.

    Returns ``struct<mentions: array<string>,
    rel: struct<subj_alias, obj_alias, year>>``.
    """
    alias_key = tuple(sorted(aliases))
    out_type = T.StructType(
        [
            T.StructField("mentions", T.ArrayType(T.StringType())),
            T.StructField(
                "rel",
                T.StructType(
                    [
                        T.StructField("subj_alias", T.StringType()),
                        T.StructField("obj_alias", T.StringType()),
                        T.StructField("year", T.StringType()),
                    ]
                ),
            ),
        ]
    )

    @F.pandas_udf(out_type)
    def _both(s: pd.Series) -> pd.DataFrame:
        pat = _compiled(alias_key)
        filled = s.fillna("")
        mentions = filled.str.findall(pat)
        ext = filled.str.extract(_RELATION_TMPL)
        ext.columns = ["subj_alias", "obj_alias", "year"]
        valid = set(alias_key)
        for c in ("subj_alias", "obj_alias"):
            col = ext[c].str.strip()
            ext[c] = col.where(col.isin(valid))
        bad = ext["subj_alias"].isna() | ext["obj_alias"].isna()
        ext.loc[bad, ["subj_alias", "obj_alias", "year"]] = None
        return pd.DataFrame(
            {"mentions": mentions, "rel": ext.to_dict("records")}
        )

    return _both(text)


def extract_relations(text: Column, aliases: list[str]) -> Column:
    """Template relation extraction: ``<A> released <B> in <year>``.

    Returns ``struct<subj_alias, obj_alias, year>`` (nulls when the text
    does not instantiate the template or A/B are not gazetteer aliases).
    """
    alias_key = tuple(sorted(aliases))
    out_type = T.StructType(
        [
            T.StructField("subj_alias", T.StringType()),
            T.StructField("obj_alias", T.StringType()),
            T.StructField("year", T.StringType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _extract(s: pd.Series) -> pd.DataFrame:
        pat = _compiled(alias_key)
        ext = s.fillna("").str.extract(_RELATION_TMPL)
        ext.columns = ["subj_alias", "obj_alias", "year"]
        # only accept template slots that are exact gazetteer aliases
        valid = set(alias_key)
        for c in ("subj_alias", "obj_alias"):
            col = ext[c].str.strip()
            ext[c] = col.where(col.isin(valid))
        bad = ext["subj_alias"].isna() | ext["obj_alias"].isna()
        ext.loc[bad, ["subj_alias", "obj_alias", "year"]] = None
        return ext

    return _extract(text)
