"""Basic graph pattern (BGP) matching over the statement table.

The SPARQL-SELECT core a KG's consumers actually run (W3C SPARQL 1.1
§18.2 evaluation semantics, conjunctive patterns only): a BGP is a list
of triple patterns whose terms are either constants or ``?variables``;
its solution set is the natural join of the per-pattern matches on the
shared variables. The reference imports RDF for exactly such downstream
consumption (Jena's ARQ would answer these; SURVEY §2 scope note) — this
is the read-side counterpart, Spark-first:

- each pattern compiles to a FILTERED SCAN of the triple table, so
  constant terms become pushed-down predicates (``PushedFilters`` on
  subj/pred/obj — visible in ``.explain``) and column pruning keeps only
  the variable positions;
- shared-variable joins are plain equi-joins Catalyst reorders freely;
  with the statement table bucketed by ``subj`` (``sources/bucketed.py``)
  subject-chained patterns co-locate.

Deliberately NOT a SPARQL parser: patterns are Python tuples. OPTIONAL /
UNION / FILTER compose as DataFrame ``join(how="left")`` / ``unionByName``
/ ``filter`` by the caller — the algebra, not the grammar, is the value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: statement-table columns a pattern position binds against
_POS = ("subj", "pred", "obj_value")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_match(
    triples: DataFrame, patterns: list[tuple[str, str, str]]
) -> DataFrame:
    """Evaluate a conjunctive BGP; returns one column per distinct
    ``?variable`` (name without the ``?``), one row per solution mapping
    (SPARQL bag semantics: duplicates are NOT collapsed — add
    ``.distinct()`` for set semantics).

    A variable repeated INSIDE one pattern constrains equality there
    (``?x :p ?x``); a variable shared ACROSS patterns joins them. A
    pattern of three constants acts as an ASK guard: solutions survive
    only if it matches (cross-joined count filter).
    """
    if not patterns:
        raise ValueError("empty BGP")
    out: DataFrame | None = None
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"triple pattern must have 3 terms: {pat!r}")
        scan = triples
        cols = []
        seen: dict[str, str] = {}
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError(f"bare '?' in pattern {pat!r}")
                if name in seen:  # intra-pattern repetition → equality
                    scan = scan.filter(F.col(pos) == F.col(seen[name]))
                else:
                    seen[name] = pos
                    cols.append(F.col(pos).alias(name))
            else:
                scan = scan.filter(F.col(pos) == term)
        if cols:
            part = scan.select(*cols)
            if out is None:
                out = part
            else:
                shared = sorted(set(out.columns) & set(part.columns))
                if shared:
                    out = out.join(part, shared)
                else:
                    out = out.crossJoin(part)
        else:
            # all-constant pattern: an ASK guard — keep solutions iff the
            # statement exists (broadcastable 0/1-row side)
            guard = scan.limit(1).select(F.lit(1).alias("_ask"))
            if out is None:
                out = guard.drop("_ask")
            else:
                out = out.join(F.broadcast(guard), F.lit(True)).drop("_ask")
    return out
