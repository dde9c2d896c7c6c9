"""Turtle / TriG input parse (reference S5 — the remaining input syntaxes).

The reference reads any standard RDF syntax through Jena (``JenaUtils.read``,
reference ``Flows.kt:66-77``); round 2 shipped N-Triples and RDF/XML *parse*
but only *rendered* Turtle/TriG. This module closes the ingestion gap with
the same architecture as ``rdf_io.parse_ntriples``: a split-union plan
whose clean branch is 100% JVM (whole-stage codegen, one packed regex pass
per line), with lines carrying raw sentinel bytes or ``\\u``/``\\U``
escapes routed whole to an exact Arrow-batched Python parser.

Scope — honest and documented: **line-oriented Turtle**, i.e. the form our
own ``functions/formats.ttl_line`` renderer emits plus the common
single-line statement subset:

- ``@prefix`` / SPARQL-style ``PREFIX`` directives (collected driver-side —
  a document carries a handful, they are dimension data);
- prefixed names (empty prefix label allowed) in subject / predicate /
  object / datatype position, ``a`` for ``rdf:type``;
- ``<iri>``, ``_:bnode``, quoted literals with Turtle ECHAR +
  ``\\u``/``\\U`` escapes, ``@lang``, ``^^<dt>`` / ``^^pn:ame``;
- numeric (integer / decimal / double) and boolean literal abbreviations,
  lexical form preserved (Jena semantics).

Round 4 added :func:`parse_turtle_docs`: a per-document statement
re-assembly pass (``_split_statements``) that normalizes the FULL common
grammar — multi-line statements, ``;`` predicate-object lists, ``,``
object lists, triple- and single-quoted strings, comments, SPARQL-style
directives — into the single-line statement form above, so real-world
``.ttl`` dumps parse without the line-oriented restriction. ``harvest.py``
routes ``.ttl`` sources through it.

Still NOT supported (loud, not silent): ``@base`` (raises — base-relative
IRIs cannot be resolved without it), blank-node property lists ``[...]``
and collections ``(...)``; such statements land in the malformed bucket
for lineage counting, exactly like ``parse_ntriples``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..vocab import RDF_TYPE, XSD_NS
from .rdf_io import PARSED_SCHEMA

XSD_BOOLEAN = XSD_NS + "boolean"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"

# Conservative Turtle name grammar (shared spelling: valid in Java AND
# Python regex). PN_LOCAL excludes a trailing dot so `p:loc .` terminates.
_PN_PREFIX = r"(?:[A-Za-z][A-Za-z0-9_-]*)?"
_PN_LOCAL = r"[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?"
_PNAME = rf"{_PN_PREFIX}:(?:{_PN_LOCAL})?"
_IRI = r"<[^>]*>"
_BNODE = r"_:\S+"
_LANG = r"@[A-Za-z][A-Za-z0-9-]*"
_QUOTED = r'"(?:[^"\\]|\\.)*"'
_QUOTED_CAP = r'^"((?:[^"\\]|\\.)*)"'
_LITERAL = rf"{_QUOTED}(?:{_LANG}|\^\^(?:{_IRI}|{_PNAME}))?"
_NUMBER = r"[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"

_STMT_PATTERN = (
    rf"^\s*({_IRI}|{_BNODE}|{_PNAME})\s+"
    rf"(a|{_IRI}|{_PNAME})\s+"
    rf"({_IRI}|{_BNODE}|{_LITERAL}|{_NUMBER}|true|false|{_PNAME})\s*\.\s*$"
)

_INT_RE = r"^[+-]?\d+$"
_DEC_RE = r"^[+-]?(?:\d+\.\d*|\.\d+)$"
_DBL_RE = rf"^{_NUMBER}$"

_PREFIX_DIRECTIVE = re.compile(
    rf"^\s*(?:@prefix|[Pp][Rr][Ee][Ff][Ii][Xx])\s+({_PN_PREFIX}):"
    r"\s*<([^>]*)>\s*\.?\s*$"
)
_BASE_DIRECTIVE = re.compile(r"^\s*(?:@base|[Bb][Aa][Ss][Ee])\s+<")
# Spark-side filter for lines that are (or could be) directives — spelled
# with char classes so the same pattern works in Java regex
_DIRECTIVE_FILTER = (
    r"^\s*(@prefix|@base|[Pp][Rr][Ee][Ff][Ii][Xx]\s|[Bb][Aa][Ss][Ee]\s)"
)

# Turtle ECHAR table (superset of N-Triples': adds \b \f \')
_TTL_UNESCAPES = {
    "\\\\": "\\", '\\"': '"', "\\'": "'", "\\n": "\n", "\\r": "\r",
    "\\t": "\t", "\\b": "\b", "\\f": "\f",
}
_TTL_ESCAPE_RE = re.compile(
    r"\\(?:[tbnrf\"'\\]|u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})"
)


def _unescape_ttl(s: str) -> str:
    def sub(m: re.Match) -> str:
        tok = m.group(0)
        if tok in _TTL_UNESCAPES:
            return _TTL_UNESCAPES[tok]
        return chr(int(tok[2:], 16))

    return _TTL_ESCAPE_RE.sub(sub, s)


def extract_prefixes(lines: DataFrame, line_col: str = "value") -> dict[str, str]:
    """Collect ``@prefix``/``PREFIX`` directives into a label→namespace map.

    Driver-side over the directive subset only — a document declares a
    handful of prefixes; this is dimension data, not triple data.

    LOUD failure policy (silent corruption is never acceptable for a
    parser): raises on ``@base`` (relative IRIs cannot be resolved), on a
    prefix label REDEFINED to a different namespace (this parser keeps one
    file-global map, so honoring only the last binding would silently
    rewrite earlier statements' IRIs), and on a directive-shaped line
    neither directive regex actually parses (the statement filter drops
    such lines from the stream, so without the raise they would vanish
    from both the output and the malformed bucket)."""
    cand = (
        lines.filter(F.col(line_col).rlike(_DIRECTIVE_FILTER))
        .select(line_col)
        .collect()
    )
    prefixes: dict[str, str] = {}
    for r in cand:
        text = r[0]
        if _BASE_DIRECTIVE.match(text):
            raise ValueError(
                "Turtle @base directive is not supported: relative IRIs "
                f"cannot be resolved ({text.strip()!r})"
            )
        m = _PREFIX_DIRECTIVE.match(text)
        if not m:
            raise ValueError(
                f"unparseable Turtle directive: {text.strip()!r}"
            )
        label, ns = m.group(1), m.group(2)
        if label in prefixes and prefixes[label] != ns:
            raise ValueError(
                f"prefix '{label}:' redefined from <{prefixes[label]}> to "
                f"<{ns}> — scoped prefix maps are not supported; split the "
                "input per scope"
            )
        prefixes[label] = ns
    return prefixes


def _parse_one_ttl(line: str, prefixes: dict[str, str]) -> tuple:
    """Exact Python twin of the JVM statement parse (sentinel fallback +
    property-test reference)."""
    m = re.match(_STMT_PATTERN, line)
    if not m:
        return (None, None, line, None, None, None)
    s_raw, p_raw, o_raw = m.group(1), m.group(2), m.group(3)

    def expand(pname: str) -> str | None:
        label, _, local = pname.partition(":")
        ns = prefixes.get(label)
        return None if ns is None else ns + local

    if s_raw.startswith("<"):
        subj = s_raw[1:-1]
    elif s_raw.startswith("_:"):
        subj = s_raw
    else:
        subj = expand(s_raw)
    if p_raw == "a":
        pred = RDF_TYPE
    elif p_raw.startswith("<"):
        pred = p_raw[1:-1]
    else:
        pred = expand(p_raw)
    if subj is None or pred is None:  # undefined prefix → malformed
        return (None, None, line, None, None, None)

    if o_raw.startswith("<"):
        return (subj, pred, o_raw[1:-1], "iri", None, None)
    if o_raw.startswith("_:"):
        return (subj, pred, o_raw, "bnode", None, None)
    if o_raw.startswith('"'):
        end = o_raw.rindex('"')
        body, suffix = o_raw[1:end], o_raw[end + 1:]
        lang = suffix[1:] if suffix.startswith("@") else None
        dt = None
        if suffix.startswith("^^<"):
            dt = suffix[3:-1]
        elif suffix.startswith("^^"):
            dt = expand(suffix[2:])
            if dt is None:
                return (None, None, line, None, None, None)
        return (subj, pred, _unescape_ttl(body), "literal", lang, dt)
    if o_raw in ("true", "false"):
        return (subj, pred, o_raw, "literal", None, XSD_BOOLEAN)
    if re.match(_INT_RE, o_raw):
        return (subj, pred, o_raw, "literal", None, XSD_INTEGER)
    if re.match(_DEC_RE, o_raw):
        return (subj, pred, o_raw, "literal", None, XSD_DECIMAL)
    if re.match(_DBL_RE, o_raw):
        return (subj, pred, o_raw, "literal", None, XSD_DOUBLE)
    obj = expand(o_raw)
    if obj is None:
        return (None, None, line, None, None, None)
    return (subj, pred, obj, "iri", None, None)


def _expand_pname(col: Column, prefixes: dict[str, str]) -> Column:
    """Prefixed name → full IRI via the (tiny, literal) prefix map; NULL on
    an undeclared prefix label — the caller maps NULL to malformed, which
    is Jena's error behavior relationally."""
    label = F.substring_index(col, ":", 1)
    local = col.substr(F.instr(col, ":") + F.lit(1), F.length(col))
    if prefixes:
        ns_map = F.create_map(
            *[F.lit(x) for kv in sorted(prefixes.items()) for x in kv]
        )
        ns = F.element_at(ns_map, label)
    else:
        ns = F.lit(None).cast("string")
    return F.concat(ns, local)


def ttl_packed_parts(line: Column) -> Column:
    """ONE packed-regex pass over a statement line → the 3-part split
    array. Project this into its OWN named column before building the
    statement columns: the ``_STMT_PATTERN`` alternation is the expensive
    evaluation, filter predicates get no common-subexpression sharing, and
    Catalyst substitutes projected aliases into pushed-down predicates —
    so every consumer must reference the ATTRIBUTE, never the expression
    (the same discipline as ``word_ngrams``' token array)."""
    sep = "\x01"
    packed = F.regexp_replace(line, _STMT_PATTERN, f"$1{sep}$2{sep}$3")
    return F.split(packed, sep)


def ttl_statement_columns(
    line: Column, prefixes: dict[str, str], parts: Column | None = None
) -> dict[str, Column]:
    """The six statement columns (+ UDF-free ``_ok``) for one Turtle
    statement line, as PURE column expressions — zero Python, zero Arrow.
    Shared by :func:`parse_turtle` and the TriG block parser.

    ``parts`` should be a pre-projected :func:`ttl_packed_parts` ATTRIBUTE
    (see its docstring); when omitted the pack is inlined, which is only
    acceptable for single-projection consumers.

    CONTRACT: callers must route lines carrying raw ``\\x01``/``\\x02``
    sentinel bytes OR ``\\u``/``\\U`` escapes to the exact-Python assist
    branch (``_ttl_fallback_udf``) — the replace-chain here handles every
    ECHAR but not numeric escapes, and the sentinels would corrupt the
    packed split. This is the same routing contract as
    ``rdf_io.parse_ntriples``; keeping the Arrow unescape out of this
    expression tree is what keeps the clean branch whole-stage-codegen
    (an embedded always-on pandas UDF measured 17-61s vs ~6s on the
    905k-line parse)."""
    if parts is None:
        parts = ttl_packed_parts(line)
    matched = F.size(parts) == 3
    s_raw = F.get(parts, 0)
    p_raw = F.get(parts, 1)
    o_raw = F.get(parts, 2)

    def unbracket(c: Column) -> Column:
        return F.substring(c, F.lit(2), F.length(c) - 2)

    subj = (
        F.when(s_raw.startswith("<"), unbracket(s_raw))
        .when(s_raw.startswith("_:"), s_raw)
        .otherwise(_expand_pname(s_raw, prefixes))
    )
    pred = (
        F.when(p_raw == "a", F.lit(RDF_TYPE))
        .when(p_raw.startswith("<"), unbracket(p_raw))
        .otherwise(_expand_pname(p_raw, prefixes))
    )

    is_iri = o_raw.startswith("<")
    is_bnode = o_raw.startswith("_:")
    is_quoted = o_raw.startswith('"')
    is_bool = o_raw.isin("true", "false")
    is_int = o_raw.rlike(_INT_RE)
    is_dec = o_raw.rlike(_DEC_RE)
    is_dbl = o_raw.rlike(_DBL_RE)

    body_raw = F.when(
        is_quoted, F.regexp_extract(o_raw, _QUOTED_CAP, 1)
    ).otherwise("")
    # ECHAR unescape: sentinel the escaped backslashes first (ordering bug
    # otherwise), then the named escapes, restore — identical machinery to
    # parse_ntriples, Turtle-extended table. \u/\U bodies never reach this
    # expression (routing contract above).
    sent = "\x02"
    step1 = F.replace(body_raw, F.lit("\\\\"), F.lit(sent))
    echar = step1
    for raw, esc in (
        ("n", "\n"), ("r", "\r"), ("t", "\t"), ("b", "\b"), ("f", "\f"),
        ('"', '"'), ("'", "'"),
    ):
        echar = F.replace(echar, F.lit("\\" + raw), F.lit(esc))
    body = F.replace(echar, F.lit(sent), F.lit("\\"))

    lang = F.when(
        is_quoted,
        F.nullif(
            F.regexp_extract(o_raw, r"@([A-Za-z][A-Za-z0-9-]*)$", 1),
            F.lit(""),
        ),
    )
    dt_iri = F.nullif(
        F.regexp_extract(o_raw, r"\^\^<([^>]*)>$", 1), F.lit("")
    )
    dt_pname = F.nullif(
        F.regexp_extract(o_raw, rf"\^\^({_PNAME})$", 1), F.lit("")
    )
    dt = F.when(is_quoted & dt_iri.isNotNull(), dt_iri).when(
        is_quoted & dt_pname.isNotNull(), _expand_pname(dt_pname, prefixes)
    )
    # a pname datatype with an undeclared prefix expands to NULL → the
    # whole statement is malformed, matching the Python twin
    dt_bad = is_quoted & dt_pname.isNotNull() & dt.isNull()

    obj_pname = _expand_pname(o_raw, prefixes)
    obj_value = (
        F.when(is_iri, unbracket(o_raw))
        .when(is_bnode | is_bool | is_int | is_dec | is_dbl, o_raw)
        .when(is_quoted, body)
        .otherwise(obj_pname)
    )
    obj_kind = (
        F.when(is_iri, "iri")
        .when(is_bnode, "bnode")
        .when(is_quoted | is_bool | is_int | is_dec | is_dbl, "literal")
        .otherwise(F.lit("iri"))
    )
    obj_datatype = (
        F.when(is_quoted, dt)
        .when(is_bool, F.lit(XSD_BOOLEAN))
        .when(is_int, F.lit(XSD_INTEGER))
        .when(is_dec, F.lit(XSD_DECIMAL))
        .when(is_dbl, F.lit(XSD_DOUBLE))
    )
    # validity WITHOUT touching obj_value: the quoted-literal body is a
    # coalesce over a never-NULL replace chain, so the only NULLable object
    # spelling is an undeclared-prefix pname — testing obj_value directly
    # would drag the body's \u-unescape PANDAS UDF into every consumer of
    # `ok` (filters included: a Python UDF in a predicate plans an extra
    # ArrowEvalPython pass — measured 70s vs 6s on the 905k-line parse)
    obj_ok = (
        is_iri | is_bnode | is_quoted | is_bool | is_int | is_dec | is_dbl
        | obj_pname.isNotNull()
    )
    ok = (
        matched
        & subj.isNotNull()
        & pred.isNotNull()
        & obj_ok
        & ~dt_bad
    )
    return {
        "subj": F.when(ok, subj),
        "pred": F.when(ok, pred),
        "obj_value": F.when(ok, obj_value).otherwise(line),
        "obj_kind": F.when(ok, obj_kind),
        "obj_lang": F.when(ok & is_quoted, lang),
        "obj_datatype": F.when(ok, obj_datatype),
        "_ok": ok,  # UDF-free — branch filters use this, never obj_kind
    }


def parse_turtle(
    lines: DataFrame,
    line_col: str = "value",
    prefixes: dict[str, str] | None = None,
    keep_malformed: bool = False,
) -> DataFrame:
    """Line-oriented Turtle text → statement rows (schema of
    ``rdf_io.PARSED_SCHEMA``).

    ``prefixes=None`` extracts the directive map from the input first (one
    cheap filtered collect over directive-shaped lines). Blank, comment and
    directive lines are consumed; anything else unparseable lands in the
    malformed bucket (``obj_kind`` NULL, raw line in ``obj_value``) and is
    dropped unless ``keep_malformed``.

    Same split-union architecture as ``rdf_io.parse_ntriples`` (round-4 —
    previously a per-column ``when(has_ctl, fb).otherwise(cols)`` coalesce
    kept an always-on NULL-fed ArrowEvalPython stage over EVERY line;
    measured ~30s vs ~6s for 905k lines at local[32]): the clean branch
    (no raw sentinel bytes — in practice everything) is 100% JVM, the
    assist branch routes whole lines through the exact Python twin, and an
    always-true nondeterministic guard keeps Catalyst from duplicating an
    expensive upstream into both branch filters.

    CALLER CONTRACT — feed MATERIALIZED lines (a file scan, a checkpoint,
    a cache), which is what real ingestion looks like. A live multi-branch
    producer plan (e.g. a render union) is NOT safe to feed directly:
    ``PushProjectionThroughUnion`` clones the assist branch's Python UDF
    into every producer branch and constraint inference re-derives
    deterministic copies of the filters below any guard — measured 5×
    inflation parsing straight off an 18-branch render union. Checkpoint
    the producer first."""
    if prefixes is None:
        prefixes = extract_prefixes(lines, line_col)

    line = F.col(line_col)
    stripped = F.trim(line)
    fallback = _ttl_fallback_udf(prefixes)

    # assist routing per the ttl_statement_columns contract: raw sentinel
    # bytes AND \u/\U escapes take the exact-Python branch
    needs_py = (
        line.contains("\x01") | line.contains("\x02")
        | line.contains("\\u") | line.contains("\\U")
    )
    # nondeterministic guard FIRST (see rdf_io.parse_ntriples): without it
    # every deterministic predicate here — including the directive rlike —
    # pushes below an upstream union/exchange and re-evaluates per
    # upstream branch (measured 38-61s vs ~7s on the 905k-line rendered
    # input, whose fixture producer is an 18-branch union)
    nd_guard = F.rand(7) > F.lit(-1.0)
    base = lines.filter(
        nd_guard
        & (stripped != "")
        & ~stripped.startswith("#")
        & ~stripped.rlike(_DIRECTIVE_FILTER)
    )
    # Two-step clean branch: the expensive packed-regex split is projected
    # ONCE into an attribute; every statement column and the malformed
    # filter reference the attribute. The guard COLUMN rides in the same
    # projection so the filter's predicate stays nondeterministic-derived
    # and can never be substituted below the projection (which would
    # re-inline the pack into the predicate — filter predicates get no
    # subexpression sharing; measured 33s vs ~7s).
    step = base.filter(~needs_py).select(
        line.alias("_l"),
        (F.rand(17) > F.lit(-1.0)).alias("_g"),
        ttl_packed_parts(line).alias("_parts"),
    )
    cols = ttl_statement_columns(
        F.col("_l"), prefixes, parts=F.col("_parts")
    )
    out_cols = (
        "subj", "pred", "obj_value", "obj_kind", "obj_lang", "obj_datatype"
    )
    if not keep_malformed:
        step = step.filter(F.col("_g") & cols["_ok"])
    clean = step.select(*[cols[c].alias(c) for c in out_cols])
    assist = (
        base.filter(needs_py)
        .select(fallback(line).alias("_p"))
        .select("_p.*")
    )
    if not keep_malformed:
        # the assist side filters the ArrowEvalPython OUTPUT attribute —
        # never re-runs the UDF
        assist = assist.filter(F.col("obj_kind").isNotNull())
    return clean.unionByName(assist)


def _ttl_fallback_udf(prefixes: dict[str, str]):
    """Arrow-batched exact-Python statement parser (sentinel-byte assist
    branch of :func:`parse_turtle` / :func:`parse_trig`)."""
    @F.pandas_udf(f"struct<{PARSED_SCHEMA}>")
    def _parse_fallback(s: pd.Series) -> pd.DataFrame:
        names = ["subj", "pred", "obj_value", "obj_kind", "obj_lang",
                 "obj_datatype"]
        mask = s.notna()
        out = pd.DataFrame(None, index=s.index, columns=names, dtype=object)
        if mask.any():
            out.loc[mask] = pd.DataFrame(
                [_parse_one_ttl(x, prefixes) for x in s[mask]],
                columns=names,
                index=s.index[mask],
            )
        return out

    return _parse_fallback


# ---------------------------------------------------------------------------
# Statement re-assembly: full-grammar documents → single-statement lines
# ---------------------------------------------------------------------------
#
# Real-world ``.ttl`` dumps (the thing Jena reads at reference
# ``Flows.kt:66-77``) use ``;`` predicate-object lists, ``,`` object lists,
# multi-line statements and triple-quoted strings almost without exception.
# ``_split_statements`` is a quote/bracket-aware tokenizer that NORMALIZES a
# document into the single-line statement form the (JVM) statement parser
# already handles: long/short strings are re-quoted to escaped double-quote
# form, ``;``/``,`` lists are expanded into full ``subj pred obj .``
# statements, directives pass through for ``extract_prefixes``. It runs
# per-document inside ``mapInPandas`` — corpus parallelism is ACROSS
# documents (same architecture as the RDF/XML reader); the per-statement
# parse stays columnar downstream.
#
# Loud-failure policy (matches the rest of the module): ``@base`` raises in
# ``extract_prefixes``; constructs the statement parser cannot represent —
# blank-node property lists ``[...]``, collections ``(...)``, a statement
# left unterminated at EOF — are emitted as single (newline-collapsed)
# lines that FAIL the downstream statement grammar and land in the
# malformed bucket for lineage counting, never silently dropped.

_LANG_SUFFIX_RE = re.compile(r"@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*")
_WORD_STOP = set(' \t\r\n\f\v;,#<"\'[](){}')


def _requote(body: str) -> str:
    """Re-quote a string body into escaped double-quote single-line form.

    Escape sequences in the source pass through VERBATIM (the downstream
    parser unescapes once); only characters that are raw-legal in the
    source quoting but illegal in a single-line double-quoted string are
    escaped here: newlines/CR (long strings), raw double quotes (long and
    single-quoted strings)."""
    out = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            out.append(body[i:i + 2])
            i += 2
            continue
        if c == '"':
            out.append('\\"')
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        else:
            out.append(c)
        i += 1
    return '"' + "".join(out) + '"'


def _tokenize_ttl(text: str) -> Iterator[tuple[str, str]]:
    """Yield ``(kind, token)``: IRI / STRING (normalized, suffix attached) /
    WORD / PUNCT. Comments consumed. Raises ValueError on unterminated
    IRIs/strings (document-level corruption, not statement-level)."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n\f\v":
            i += 1
            continue
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "<":
            j = text.find(">", i)
            if j < 0:
                raise ValueError("unterminated IRI in Turtle document")
            yield "IRI", text[i:j + 1]
            i = j + 1
            continue
        if c in "\"'":
            if text[i:i + 3] == c * 3:
                j = i + 3
                while True:
                    k = text.find(c * 3, j)
                    if k < 0:
                        raise ValueError(
                            "unterminated long string in Turtle document"
                        )
                    b = 0
                    while k - 1 - b >= i + 3 and text[k - 1 - b] == "\\":
                        b += 1
                    if b % 2 == 0:
                        break
                    j = k + 1
                body, i = text[i + 3:k], k + 3
                lit = _requote(body)
            else:
                j = i + 1
                while j < n and text[j] not in (c, "\n"):
                    j += 2 if text[j] == "\\" else 1
                if j >= n or text[j] == "\n":
                    raise ValueError(
                        "unterminated string in Turtle document"
                    )
                body, i = text[i + 1:j], j + 1
                lit = _requote(body) if c == "'" else (
                    '"' + body + '"'
                )
            # attach an IMMEDIATE @lang / ^^datatype suffix (no whitespace —
            # the overwhelmingly dominant spelling; a space-separated suffix
            # becomes its own WORD and the statement lands malformed, loud)
            m = _LANG_SUFFIX_RE.match(text, i)
            if m:
                lit += m.group(0)
                i = m.end()
            elif text[i:i + 2] == "^^":
                if text[i + 2:i + 3] == "<":
                    j = text.find(">", i + 2)
                    if j < 0:
                        raise ValueError("unterminated datatype IRI")
                    lit += text[i:j + 1]
                    i = j + 1
                else:
                    j = i + 2
                    while j < n and text[j] not in _WORD_STOP:
                        j += 1
                    tok = text[i:j]
                    if tok[2:].endswith("."):
                        tok = tok[:-1]
                    lit += tok
                    i += len(tok)
            yield "STRING", lit
            continue
        if c in ";,.[](){}":
            yield "PUNCT", c
            i += 1
            continue
        j = i
        while j < n and text[j] not in _WORD_STOP and text[j] != ".":
            j += 1
        # '.' inside a word (pname local part, decimal) continues the word
        # ONLY when more word chars follow — a trailing '.' terminates the
        # statement (PN_LOCAL and decimals never end with a dot)
        while j < n and text[j] == ".":
            if j + 1 < n and text[j + 1] not in _WORD_STOP and text[j + 1] != ".":
                j += 2
                while j < n and text[j] not in _WORD_STOP and text[j] != ".":
                    j += 1
            else:
                break
        yield "WORD", text[i:j]
        i = j


def _split_statements(text: str) -> list[str]:
    """Full-grammar Turtle document → normalized single-statement lines
    (directives included; unsupported/unterminated statements collapsed to
    single malformed-by-construction lines)."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    unsupported = False

    def flush(terminated: bool) -> None:
        nonlocal cur, unsupported
        if not cur:
            unsupported = False
            return
        if unsupported or not terminated:
            out.append(" ".join(cur).replace("\n", "\\n"))
        else:
            out.extend(_expand_statement(cur))
        cur, unsupported = [], False

    toks = _tokenize_ttl(text)
    for kind, tok in toks:
        if kind == "PUNCT" and tok in "[](){}":
            depth += 1 if tok in "[({" else -1
            unsupported = True
            cur.append(tok)
        elif kind == "PUNCT" and tok == "." and depth <= 0:
            flush(terminated=True)
        elif kind == "WORD" and not cur and tok.lower() in (
            "@prefix", "prefix", "@base", "base",
        ):
            # directive: @-form terminates with '.', SPARQL form does not —
            # consume exactly (label, iri) and emit; extract_prefixes
            # validates (and raises on @base)
            rest = [t for _, t in (next(toks, (None, None)),
                                   next(toks, (None, None))) if t]
            out.append(" ".join([tok, *rest]) + (
                " ." if tok.startswith("@") else ""
            ))
        else:
            cur.append(tok)
    flush(terminated=False)
    return out


def _expand_statement(tokens: list[str]) -> list[str]:
    """``subj p1 o1 ; p2 o2a , o2b`` token list → full statement lines.
    Structurally invalid shapes collapse to one malformed line."""
    bad = [" ".join(tokens) + " ."]
    if not tokens:
        return []
    subj, rest = tokens[0], tokens[1:]
    if subj in (";", ","):
        return bad
    groups: list[list[str]] = [[]]
    for t in rest:
        if t == ";":
            groups.append([])
        else:
            groups[-1].append(t)
    lines = []
    for g in groups:
        if not g:
            continue  # trailing/duplicate ';' is legal Turtle
        pred, objs = g[0], [[]]
        if pred in (",",):
            return bad
        for t in g[1:]:
            if t == ",":
                objs.append([])
            else:
                objs[-1].append(t)
        for o in objs:
            if len(o) != 1:
                return bad
            lines.append(f"{subj} {pred} {o[0]} .")
    return lines or bad


#: one document is re-assembled by one task (same per-document execution
#: model as the reference's Jena read, ``Flows.kt:66-77``); past ~1GB a
#: single document also approaches Spark's single-string limits, so fail
#: loudly with actionable guidance instead of OOMing mid-task.
MAX_TTL_DOC_BYTES = 1 << 30


def normalize_turtle_docs(
    docs: DataFrame, ttl_col: str = "ttl", carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Whole Turtle documents → one normalized statement/directive line per
    row (column ``value`` + ``carry_cols``), via an Arrow-batched
    per-document re-assembly pass.

    Parallelism is ACROSS documents — a single multi-GB ``.ttl`` dump
    normalizes in one task (and past ``MAX_TTL_DOC_BYTES`` raises with
    guidance to split the dump into parts first); this mirrors the
    reference, which reads one document single-threaded through Jena."""
    import pandas as pd  # noqa: F811 — local for the executor closure

    carry = list(carry_cols)
    schema = ", ".join(
        [f"{c} string" for c in carry] + ["value string"]
    )

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                text = r[ttl_col] or ""
                if len(text) > MAX_TTL_DOC_BYTES:
                    raise ValueError(
                        f"Turtle document of {len(text)} chars exceeds the "
                        f"{MAX_TTL_DOC_BYTES}-byte single-document limit — "
                        "split the dump into parts (statement re-assembly "
                        "parallelizes across documents, not within one)"
                    )
                for line in _split_statements(text):
                    rows.append([*(r[c] for c in carry), line])
            yield pd.DataFrame(rows, columns=[*carry, "value"])

    return docs.mapInPandas(_norm, schema)


def parse_turtle_docs(
    docs: DataFrame,
    ttl_col: str = "ttl",
    prefixes: dict[str, str] | None = None,
    keep_malformed: bool = False,
) -> DataFrame:
    """Full-grammar(er) Turtle: whole documents → statement rows.

    ``normalize_turtle_docs`` re-assembles multi-line statements and
    expands ``;``/``,`` lists; the existing single-statement machinery
    (prefix extraction, JVM statement parse, sentinel fallback) runs
    unchanged on the normalized lines. The normalized line stream is
    persisted when prefixes must be extracted from it — otherwise the
    Python re-assembly pass would run twice (once for the directive
    collect, once for the parse)."""
    lines = normalize_turtle_docs(docs, ttl_col)
    if prefixes is None:
        from pyspark import StorageLevel

        lines = lines.persist(StorageLevel.MEMORY_AND_DISK)
    return parse_turtle(
        lines, "value", prefixes=prefixes, keep_malformed=keep_malformed
    )


def parse_trig(
    docs: DataFrame,
    trig_col: str = "trig",
    prefixes: dict[str, str] | None = None,
    keep_malformed: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """TriG documents → statement rows with a ``graph`` column.

    One document = one TriG string of ``<graph> { ... }`` blocks (the shape
    ``functions/formats.trig_docs`` emits, and the line-oriented subset of
    standard TriG: graph headers and ``}`` on their own lines, one
    statement per line inside). Lines explode narrowly per document; the
    graph context is the last seen header (a window per document — TriG
    documents are bounded, the corpus parallelism is across documents).

    ``prefixes=None`` extracts the ``@prefix`` directive map from the
    documents themselves (same contract as :func:`parse_turtle` — a
    standard TriG dump declares prefixed names, and parsing it with an
    empty map would reject every statement as undeclared-prefix
    malformed).

    The line-context window is partitioned by an INTERNAL per-document key
    (``monotonically_increasing_id`` stamped before the explode) — never by
    the document bytes (document-sized shuffle keys) and never by
    ``carry_cols`` (whose uniqueness the caller couldn't be trusted to
    guarantee: with a shared key, ``_pos`` ties across documents and the
    default RANGE frame would leak graph headers between documents).
    ``carry_cols`` are pass-through annotation columns only."""
    if prefixes is None:
        prefixes = extract_prefixes(
            docs.select(
                F.explode(F.split(F.col(trig_col), "\n")).alias("value")
            ),
            "value",
        )
    from pyspark.sql import Window

    docs = docs.withColumn("_doc", F.monotonically_increasing_id())
    w = Window.partitionBy("_doc").orderBy("_pos")
    header = F.regexp_extract(F.col("_line"), r"^\s*<([^>]*)>\s*\{\s*$", 1)
    exploded = (
        docs.select(
            *carry_cols,
            "_doc",
            F.posexplode(F.split(F.col(trig_col), "\n")).alias(
                "_pos", "_line"
            ),
        )
        .withColumn("_hdr", F.nullif(header, F.lit("")))
        .withColumn(
            "graph", F.last("_hdr", ignorenulls=True).over(w)
        )
        .filter(
            # guard-first: keeps these predicates (and the branch filters
            # above) from pushing below the per-document explode
            (F.rand(13) > F.lit(-1.0))
            & F.col("_hdr").isNull()
            & (F.trim("_line") != "")
            & (F.trim("_line") != "}")
            & ~F.trim("_line").startswith("#")
            & ~F.trim("_line").rlike(_DIRECTIVE_FILTER)
        )
    )
    # Sentinel-byte fallback, same split-union routing as parse_turtle:
    # the JVM replace-chain in ttl_statement_columns uses \x01/\x02
    # internally, so a literal carrying either raw byte (legal inside
    # Turtle quoted literals) must take the exact-Python path instead of
    # silently corrupting (\x02 → '\\') or landing in the malformed
    # bucket (\x01). The clean branch never touches Python; the malformed
    # drop uses the UDF-free validity expression (see parse_turtle).
    line = F.col("_line")
    needs_py = (
        line.contains("\x01") | line.contains("\x02")
        | line.contains("\\u") | line.contains("\\U")
    )
    fallback = _ttl_fallback_udf(prefixes)
    out_cols = (
        "subj", "pred", "obj_value", "obj_kind", "obj_lang", "obj_datatype"
    )
    # same two-step discipline as parse_turtle: pack once into an
    # attribute, guard column blocks predicate substitution
    step = exploded.filter(~needs_py).select(
        *carry_cols,
        "graph",
        line.alias("_l"),
        (F.rand(17) > F.lit(-1.0)).alias("_g"),
        ttl_packed_parts(line).alias("_parts"),
    )
    cols = ttl_statement_columns(
        F.col("_l"), prefixes, parts=F.col("_parts")
    )
    if not keep_malformed:
        step = step.filter(F.col("_g") & cols["_ok"])
    clean = step.select(
        *carry_cols, "graph", *[cols[c].alias(c) for c in out_cols]
    )
    assist = (
        exploded.filter(needs_py)
        .select(*carry_cols, "graph", fallback(line).alias("_p"))
        .select(*carry_cols, "graph", "_p.*")
    )
    if not keep_malformed:
        assist = assist.filter(F.col("obj_kind").isNotNull())
    return clean.unionByName(assist)
