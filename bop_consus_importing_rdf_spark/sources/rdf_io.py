"""RDF document ingestion (reference S1/S3/S4/S5).

The reference opens a source document (``Flows.kt:47-63``), optionally
gunzips it (CHANGELOG 1.7.0), optionally pre-processes malformed
URIs/encodings (``Flows.kt:52-64``), and parses it into a triple model via
Jena (``JenaUtils.read``, ``Flows.kt:66-77``). Here:

- **acquire + gunzip**: ``spark.read.text`` — Spark decompresses ``.gz``
  sources transparently, one document line per row, partition-parallel.
- **pre-process**: column-expression fix-ups (BOM strip, control-char
  removal, space-in-IRI %-encoding) — reference behavior *(ext)*, applied
  before parse exactly like the temp-file rewrite.
- **parse**: an Arrow-batched ``mapInPandas`` N-Triples parser (no RDF lib
  in this container; N-Triples is the reference's default output syntax and
  our canonical comparison form). The parser is the exact inverse of
  ``functions/ntriples.py`` — round-trip tested. Malformed lines get
  ``obj_kind = NULL`` so callers can count rejects into lineage_metrics
  (the reference rethrows with address context, ``Flows.kt:75-77``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_SCHEMA = (
    "subj string, pred string, obj_value string, obj_kind string, "
    "obj_lang string, obj_datatype string"
)

_NT_LINE = re.compile(
    r"^\s*(?P<subj><[^>]*>|_:\S+)\s+"
    r"<(?P<pred>[^>]*)>\s+"
    r"(?P<obj><[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\""
    r"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)"
    r"\s*\.\s*$"
)

_UNESCAPES = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
}
_ESCAPE_RE = re.compile(r"\\(?:[\\\"nrt]|u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})")


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        tok = m.group(0)
        if tok in _UNESCAPES:
            return _UNESCAPES[tok]
        return chr(int(tok[2:], 16))  # \uXXXX / \UXXXXXXXX

    return _ESCAPE_RE.sub(sub, s)


def _parse_one(line: str) -> tuple:
    m = _NT_LINE.match(line)
    if not m:
        return (None, None, line, None, None, None)
    subj = m.group("subj")
    subj = subj[1:-1] if subj.startswith("<") else subj
    pred = m.group("pred")
    obj = m.group("obj")
    if obj.startswith("<"):
        return (subj, pred, obj[1:-1], "iri", None, None)
    if obj.startswith("_:"):
        return (subj, pred, obj, "bnode", None, None)
    # literal: split off @lang / ^^<dt> suffix after the closing quote
    end = obj.rindex('"')
    body, suffix = obj[1:end], obj[end + 1:]
    lang = suffix[1:] if suffix.startswith("@") else None
    dt = suffix[3:-1] if suffix.startswith("^^<") else None
    return (subj, pred, _unescape(body), "literal", lang, dt)


def read_rdf_source(spark: SparkSession, path: str) -> DataFrame:
    """S1+S3: open a (possibly .gz) N-Triples document as one line per row."""
    return spark.read.text(path)


def pre_process(line: Column) -> Column:
    """S4: fix-ups before parse — BOM strip, control chars (except tab),
    raw spaces inside IRI brackets → %20."""
    c = F.regexp_replace(line, "﻿", "")
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    # iteratively %-encode spaces inside <...>: one pass handles one space;
    # three passes cover the pathological cases the reference's
    # preProcessing flag exists for
    for _ in range(3):
        c = F.regexp_replace(c, r"(<[^> ]*) ([^>]*>)", r"$1%20$2")
    return c


def parse_ntriples(
    lines: DataFrame, line_col: str = "value", keep_malformed: bool = False
) -> DataFrame:
    """S5: N-Triples text → statement rows, Arrow-batched.

    Malformed/comment/blank lines are dropped unless ``keep_malformed``
    (then returned with ``obj_kind`` NULL and the raw line in
    ``obj_value`` for lineage auditing).
    """
    cols = lines.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            src = pdf[line_col]
            mask = src.str.strip().str.len() > 0
            mask &= ~src.str.strip().str.startswith("#")
            parsed = [_parse_one(x) for x in src[mask]]
            out = pd.DataFrame(
                parsed,
                columns=[
                    "subj", "pred", "obj_value", "obj_kind",
                    "obj_lang", "obj_datatype",
                ],
            )
            yield out

    parsed = lines.mapInPandas(batches, PARSED_SCHEMA)
    if keep_malformed:
        return parsed
    return parsed.filter(F.col("obj_kind").isNotNull())
