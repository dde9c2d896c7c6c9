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

import numpy as np
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


_LITERAL_RE = re.compile(r'^"((?:[^"\\]|\\.)*)"(.*)$')


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


# Java-regex spelling of _NT_LINE (no named groups) for regexp_extract
_NT_PATTERN = (
    r"^\s*(<[^>]*>|_:\S+)\s+"
    r"<([^>]*)>\s+"
    r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)"
    r"\s*\.\s*$"
)


def parse_ntriples(
    lines: DataFrame,
    line_col: str = "value",
    keep_malformed: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """S5: N-Triples text → statement rows (+ ``carry_cols`` passed through,
    e.g. the graph column :func:`parse_nquads` splits off).

    The ingestion hot path at 100 TB, so the STRUCTURE parse is entirely
    JVM-side ``regexp_extract`` column expressions — whole-stage-codegen,
    zero Python, no Arrow round-trip for subjects/predicates/IRIs. The one
    thing SQL cannot express is ``\\uXXXX`` numeric unescaping, so literal
    BODIES alone cross the Arrow boundary through a pandas UDF that
    fast-paths escape-free strings (one vectorized ``contains`` per batch;
    the interpreted regex substitution runs only on rows that actually
    carry a backslash). Measured on 905k lines at local[32]: 1.4× the
    whole-row ``mapInPandas`` parser end-to-end (2.9s vs 4.1s — this box
    saturates its memory bus, a real cluster fans out further), and a
    pandas ``.str``-chain rewrite measured 2× SLOWER than the per-row loop
    (pandas string ops are per-row loops with per-op overhead; the only
    real fix is keeping structure parsing in the JVM).

    Malformed/comment/blank lines are dropped unless ``keep_malformed``
    (then returned with ``obj_kind`` NULL and the raw line in
    ``obj_value`` for lineage auditing).

    Plain N-Triples PERMITS raw C0 controls inside literal bodies (only
    *canonical* N-Triples mandates ``\\u`` escapes), so the JVM fast path's
    in-band ``\\x01``/``\\x02`` sentinels cannot be assumed absent: any line
    carrying either byte is routed whole to the Python ``_parse_one``
    fallback (two cheap non-regex ``contains`` probes per line; the Arrow
    batch ships NULL for every clean line). Clean lines — in practice all
    of them — never leave the JVM.
    """
    @F.pandas_udf("string")
    def _unescape_bodies(s: pd.Series) -> pd.Series:
        mask = s.notna() & s.str.contains("\\", regex=False)
        if mask.any():
            s = s.copy()
            s[mask] = s[mask].map(_unescape)
        return s

    @F.pandas_udf(f"struct<{PARSED_SCHEMA}>")
    def _parse_fallback(s: pd.Series) -> pd.DataFrame:
        cols = ["subj", "pred", "obj_value", "obj_kind", "obj_lang",
                "obj_datatype"]
        mask = s.notna()
        out = pd.DataFrame(None, index=s.index, columns=cols, dtype=object)
        if mask.any():  # clean batches (in practice: all) skip the row loop
            out.loc[mask] = pd.DataFrame(
                [_parse_one(x) for x in s[mask]],
                columns=cols,
                index=s.index[mask],
            )
        return out

    line = F.col(line_col)
    stripped = F.trim(line)
    # sentinel-collision guard (see docstring): lines containing the raw
    # sentinel bytes take the exact Python parser instead of the JVM path
    has_ctl = line.contains("\x01") | line.contains("\x02")
    fb = _parse_fallback(F.when(has_ctl, line))
    # ONE regex pass over the line: pack the three groups with a \x01
    # separator, then split — measured 4× cheaper than three independent
    # regexp_extract calls (each re-runs the full-line match). Lines whose
    # bytes could collide with the separator were routed to the fallback
    # above, so arity-3 here really does mean "matched".
    # Round-3 negative results (so nobody re-tries them): (a) folding
    # body/lang/dt into the packed pattern as a 6-group replacement measured
    # ~8% SLOWER at sf0.1 — the packed string then carries the literal body
    # twice and the nested quantified capture costs more than the short
    # anchored per-obj extracts save; (b) gating those extracts behind an
    # is-literal prefix check was also a wash on this literal-heavy corpus.
    sep = "\x01"
    packed = F.regexp_replace(line, _NT_PATTERN, f"$1{sep}$2{sep}$3")
    parts = F.split(packed, sep)
    matched = F.size(parts) == 3
    # F.get (NULL on out-of-bounds), NOT parts[i]: ANSI mode raises on OOB,
    # and the Python-UDF input projection evaluates these eagerly even for
    # unmatched (arity≠3) rows where the CASE guard would never take them
    subj_raw = F.get(parts, 0)
    pred_raw = F.get(parts, 1)
    obj_raw = F.get(parts, 2)

    subj = F.when(
        subj_raw.startswith("<"),
        F.substring(subj_raw, F.lit(2), F.length(subj_raw) - 2),
    ).otherwise(subj_raw)

    is_iri = obj_raw.startswith("<")
    is_bnode = obj_raw.startswith("_:")
    body_raw = F.regexp_extract(obj_raw, r'^"((?:[^"\\]|\\.)*)"', 1)
    # ECHAR unescaping stays in SQL: neutralize escaped backslashes with a
    # \x02 sentinel FIRST (replace-chain ordering bug otherwise: the '\' of
    # an unescaped '\\' would fuse with a following 'n'), then the four
    # remaining ECHARs, then restore the backslashes. Only literals still
    # carrying a \uXXXX/\UXXXX numeric escape after sentinel-ing — the one
    # construct SQL can't express — cross the Arrow boundary; every other
    # row ships a NULL, which Arrow serializes to a validity bit.
    sent = "\x02"
    step1 = F.replace(body_raw, F.lit("\\\\"), F.lit(sent))
    echar = step1
    for raw, esc in (("n", "\n"), ("r", "\r"), ("t", "\t"), ('"', '"')):
        echar = F.replace(echar, F.lit("\\" + raw), F.lit(esc))
    sql_unescaped = F.replace(echar, F.lit(sent), F.lit("\\"))
    has_unicode = step1.contains("\\u") | step1.contains("\\U")
    body = F.coalesce(
        _unescape_bodies(F.when(has_unicode, body_raw)), sql_unescaped
    )
    lang = F.nullif(
        F.regexp_extract(obj_raw, r"@([A-Za-z][A-Za-z0-9-]*)$", 1), F.lit("")
    )
    dt = F.nullif(F.regexp_extract(obj_raw, r"\^\^<([^>]*)>$", 1), F.lit(""))

    iri_value = F.substring(obj_raw, F.lit(2), F.length(obj_raw) - 2)
    parsed = (
        lines.filter((stripped != "") & ~stripped.startswith("#"))
        .select(
            *[F.col(c) for c in carry_cols],
            F.when(has_ctl, fb["subj"])
            .when(matched, subj)
            .alias("subj"),
            F.when(has_ctl, fb["pred"])
            .when(matched, pred_raw)
            .alias("pred"),
            F.when(has_ctl, fb["obj_value"])
            .when(~matched, line)
            .when(is_iri, iri_value)
            .when(is_bnode, obj_raw)
            .otherwise(body)
            .alias("obj_value"),
            F.when(has_ctl, fb["obj_kind"])
            .when(matched & is_iri, "iri")
            .when(matched & is_bnode, "bnode")
            .when(matched, "literal")
            .alias("obj_kind"),
            F.when(has_ctl, fb["obj_lang"])
            .when(matched & ~is_iri & ~is_bnode, lang)
            .alias("obj_lang"),
            F.when(has_ctl, fb["obj_datatype"])
            .when(matched & ~is_iri & ~is_bnode, dt)
            .alias("obj_datatype"),
        )
    )
    if keep_malformed:
        return parsed
    return parsed.filter(F.col("obj_kind").isNotNull())


# N-Quads = N-Triples + optional graph label (IRI or bnode) before the dot.
# One regex pass splits the label off; the rest delegates to parse_ntriples,
# so every sentinel / escaping / malformed behavior is inherited verbatim.
_NQ_SPLIT = (
    r"^(\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+"
    r'(?:<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?))"
    r"\s+(<[^>]*>|_:\S+)\s*\.\s*$"
)


def parse_nquads(
    lines: DataFrame, line_col: str = "value", keep_malformed: bool = False
) -> DataFrame:
    """S5 (N-Quads): statement rows + ``graph`` column.

    Per the N-Quads spec the graph label is OPTIONAL — a plain N-Triples
    line parses with ``graph`` NULL (the default graph). IRI labels are
    unbracketed; blank-node labels pass through as ``_:…``."""
    line = F.col(line_col)
    g_raw = F.nullif(F.regexp_extract(line, _NQ_SPLIT, 2), F.lit(""))
    graph = F.when(
        g_raw.startswith("<"),
        F.substring(g_raw, F.lit(2), F.length(g_raw) - 2),
    ).otherwise(g_raw)
    # matched lines shrink to their SPO triple; unmatched pass through
    # unchanged (either a valid 3-term line → default graph, or malformed)
    rewritten = F.regexp_replace(line, _NQ_SPLIT, "$1 .")
    base = lines.select(graph.alias("graph"), rewritten.alias("_nt"))
    return parse_ntriples(
        base, "_nt", keep_malformed=keep_malformed, carry_cols=("graph",)
    )
