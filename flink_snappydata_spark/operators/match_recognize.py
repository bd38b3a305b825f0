"""MATCH_RECOGNIZE front-end for the CEP pattern builder.

Flink exposes its CEP library to SQL users through the SQL-standard
``MATCH_RECOGNIZE`` clause (reference:
``flinksamples``' platform docs; FlinkSQL ``table.sql.MatchRecognize``)
— row-pattern matching with ``PARTITION BY`` / ``ORDER BY`` /
``PATTERN`` / ``DEFINE``. Spark SQL has no MATCH_RECOGNIZE; the engine
already has the compile target (:func:`~flink_snappydata_spark.
operators.cep.cep_match_pattern` — NFA-equivalent run matching with
AFTER MATCH SKIP PAST LAST ROW), so this module is surface, not
engine: a small, strict parser from the clause's text to
``[PatternStage]`` + ``within``.

Supported subset (everything the compile target expresses):

* ``PARTITION BY user_id`` and ``ORDER BY ts`` — optional, but when
  present must name the engine's hard-wired keys (the builder
  partitions by ``user_id`` and orders by ``(ts, event_id)``);
* ``PATTERN ( VAR[quant] ... )`` with quantifiers: bare (exactly
  once), ``+`` (one or more), ``{m}``, ``{m,}``, ``{m,n}`` — strict
  sequential contiguity, the MATCH_RECOGNIZE default — plus the
  optional forms ``?``, ``*``, ``{0,n}``, ``{0,}`` at INTERIOR
  pattern positions (compiled as the strict realization union; the
  first and last variable must match at least one row);
* ``WITHIN INTERVAL '<n>' <UNIT>`` — fixed-width units only;
* ``AFTER MATCH SKIP PAST LAST ROW`` — optional (it is the only
  strategy the engine implements; any other skip clause is rejected);
* ``DEFINE var AS <boolean sql>, ...`` — conditions are Spark SQL
  expressions over the event row; a pattern variable with no DEFINE
  defaults to TRUE (the SQL-standard rule), subject to the engine's
  first-match-wins label priority for overlapping conditions.

Also supported: ``MEASURES`` entries of the forms
``FIRST(var.value) AS a`` / ``LAST(var.value) AS a`` /
``COUNT(var.*) AS a`` — appended as output columns after the fixed
``(user_id, match_start, match_end, n_<var>...)`` shape (value
captures need per-branch state, so a MEASURES clause compiles to the
strict machine mode like navigation does).

Rejected loudly (not silently narrowed): other MEASURES expressions
(aggregates, arithmetic, MATCH_NUMBER/CLASSIFIER), optional
quantifiers on the first/last variable (use the builder's
``relaxed_nfa`` mode for optional edges), alternation / grouping
inside PATTERN, and reluctant (``+?``, ``??``, ``*?``, ``{m,n}?``)
quantifiers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_snappydata_spark.operators.cep import (
    PatternStage,
    cep_match_pattern,
)

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"

#: var + optional quantifier: bare, +, *, ?, {m}, {m,}, {m,n} — each
#: optionally followed by a reluctant ? (captured so it can be
#: rejected loudly instead of left as unparsed trailing text)
_TOKEN_RE = re.compile(
    rf"({_IDENT})(\+\??|\*\??|\?\??|\{{\s*\d+\s*(?:,\s*\d*\s*)?\}}\??)?\s*"
)

_INTERVAL_RE = re.compile(
    r"WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)", re.IGNORECASE
)

#: DEFINE conjuncts of the SQL-standard navigation forms — the only
#: PREV()/FIRST() shapes supported: `value OP PREV(value)` (previous
#: ROW of the match; under strict contiguity == the previously
#: consumed event) and `value OP FIRST(var.value)` (first row mapped
#: to `var`), with optional `self.`-style variable prefixes.
_PREV_RE = re.compile(
    rf"^\(?\s*(?:{_IDENT}\.)?value\s*(>=|<=|>|<)\s*"
    rf"PREV\s*\(\s*(?:{_IDENT}\.)?value\s*\)\s*\)?$",
    re.IGNORECASE,
)
_FIRST_RE = re.compile(
    rf"^\(?\s*(?:{_IDENT}\.)?value\s*(>=|<=|>|<)\s*"
    rf"FIRST\s*\(\s*({_IDENT})\.value\s*\)\s*\)?$",
    re.IGNORECASE,
)


def _split_conjuncts(cond: str) -> list[str]:
    """Split a DEFINE condition on top-level ANDs (parens respected)."""
    parts, depth, cur = [], 0, []
    tokens = re.split(r"(\(|\)|\bAND\b)", cond, flags=re.IGNORECASE)
    for tok in tokens:
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0 and tok.upper() == "AND":
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(tok)
    parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _extract_rel(
    var: str, cond: str, names_lower: list[str]
) -> tuple[str | None, tuple | None]:
    """Pull at most one PREV()/FIRST() navigation conjunct out of a
    DEFINE condition → (remaining base condition or None, rel spec or
    None). Any other PREV/FIRST usage is rejected loudly."""
    base_parts: list[str] = []
    rel: tuple | None = None
    for part in _split_conjuncts(cond):
        pm = _PREV_RE.match(part)
        fm = _FIRST_RE.match(part)
        if pm or fm:
            if rel is not None:
                raise MatchRecognizeError(
                    f"DEFINE {var}: at most one PREV()/FIRST() "
                    "navigation conjunct per variable"
                )
            if pm:
                rel = ("prev", pm.group(1))
            else:
                ref = fm.group(2).lower()
                if ref not in names_lower:
                    raise MatchRecognizeError(
                        f"DEFINE {var}: FIRST({fm.group(2)}.value) does "
                        f"not name a PATTERN variable (pattern has "
                        f"{names_lower})"
                    )
                rel = ("first", names_lower.index(ref) + 1, fm.group(1))
        else:
            base_parts.append(part)
    base = " AND ".join(base_parts) if base_parts else None
    if base and re.search(r"\b(PREV|FIRST|LAST|NEXT)\s*\(", base, re.I):
        raise MatchRecognizeError(
            f"DEFINE {var}: row-pattern navigation is supported only as "
            "a top-level conjunct of the form `value OP PREV(value)` or "
            "`value OP FIRST(var.value)`"
        )
    return base, rel


class MatchRecognizeError(ValueError):
    """Parse/validation failure with the offending clause fragment."""


def _clause(sql: str, name: str) -> str | None:
    """Extract the parenthesized body of ``name ( ... )`` (balanced)."""
    m = re.search(rf"{name}\s*\(", sql, re.IGNORECASE)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise MatchRecognizeError(f"unbalanced parentheses in {name} clause")
    return sql[m.end() : i - 1]


def _parse_quant(var: str, q: str | None) -> tuple[int, int | None]:
    if q is None:
        return (1, 1)  # bare variable: exactly one row (SQL standard)
    if q == "?":
        return (0, 1)  # optional row (interior positions only)
    if q == "*":
        return (0, None)  # zero or more (interior positions only)
    if q.endswith("?") and q != "?":
        raise MatchRecognizeError(
            f"{var}{q}: reluctant quantifiers are not supported "
            "(matching is greedy, the MATCH_RECOGNIZE default)"
        )
    if q == "+":
        return (1, None)
    body = q.strip("{}").strip()
    if "," in body:
        lo_s, hi_s = (s.strip() for s in body.split(",", 1))
        lo = int(lo_s)
        hi = int(hi_s) if hi_s else None
    else:
        lo = hi = int(body)
    if lo == hi == 0:
        raise MatchRecognizeError(f"{var}{q}: {{0}} matches nothing")
    if hi is not None and hi < lo:
        raise MatchRecognizeError(f"{var}{q}: max < min")
    return (lo, hi)


def compile_match_recognize(
    sql: str,
) -> tuple[list[PatternStage], str | None, list[tuple] | None]:
    """Parse a MATCH_RECOGNIZE clause body to
    ``(stages, within, measures)`` — the :func:`cep_match_pattern`
    inputs (measures = (alias, kind, var) triples or None). Accepts
    the full clause with or without the ``MATCH_RECOGNIZE ( ... )``
    wrapper."""
    body = _clause(sql, "MATCH_RECOGNIZE") or sql

    measures: list[tuple[str, str, str]] | None = None
    mm = re.search(
        r"\bMEASURES\b(.*?)(?=\bPARTITION\b|\bORDER\s+BY\b|\bAFTER\b"
        r"|\bPATTERN\b|\bDEFINE\b|\bWITHIN\b|$)",
        body,
        re.IGNORECASE | re.DOTALL,
    )
    if mm:
        measures = []
        for entry in mm.group(1).split(","):
            entry = entry.strip()
            if not entry:
                continue
            em = re.fullmatch(
                rf"(FIRST|LAST)\s*\(\s*({_IDENT})\.value\s*\)"
                rf"\s+AS\s+({_IDENT})",
                entry,
                re.IGNORECASE,
            )
            cm = re.fullmatch(
                rf"COUNT\s*\(\s*({_IDENT})\.\*\s*\)\s+AS\s+({_IDENT})",
                entry,
                re.IGNORECASE,
            )
            if em:
                measures.append(
                    (em.group(3), em.group(1).lower(), em.group(2).lower())
                )
            elif cm:
                measures.append((cm.group(2), "count", cm.group(1).lower()))
            else:
                raise MatchRecognizeError(
                    f"MEASURES entry {entry!r}: only "
                    "FIRST(var.value) AS a / LAST(var.value) AS a / "
                    "COUNT(var.*) AS a are supported"
                )
    part = re.search(rf"PARTITION\s+BY\s+({_IDENT})", body, re.IGNORECASE)
    if part and part.group(1).lower() != "user_id":
        raise MatchRecognizeError(
            f"PARTITION BY {part.group(1)}: the engine partitions "
            "patterns by user_id"
        )
    order = re.search(rf"ORDER\s+BY\s+({_IDENT})", body, re.IGNORECASE)
    if order and order.group(1).lower() != "ts":
        raise MatchRecognizeError(
            f"ORDER BY {order.group(1)}: the engine orders by "
            "(ts, event_id)"
        )
    skip = re.search(
        r"AFTER\s+MATCH\s+SKIP\s+(.*?)(?=\bPATTERN\b|\bWITHIN\b|$)",
        body,
        re.IGNORECASE | re.DOTALL,
    )
    if skip and not re.fullmatch(
        r"PAST\s+LAST\s+ROW\s*", skip.group(1), re.IGNORECASE
    ):
        raise MatchRecognizeError(
            f"AFTER MATCH SKIP {skip.group(1).strip()}: only "
            "SKIP PAST LAST ROW is supported"
        )

    pattern = _clause(body, "PATTERN")
    if pattern is None:
        raise MatchRecognizeError("missing PATTERN ( ... ) clause")
    if re.search(r"[|()]", pattern):
        raise MatchRecognizeError(
            "alternation/grouping inside PATTERN is not supported: "
            "patterns are a flat variable sequence"
        )
    pos, tokens = 0, []
    pattern = pattern.strip()
    while pos < len(pattern):
        m = _TOKEN_RE.match(pattern, pos)
        if not m:
            raise MatchRecognizeError(
                f"cannot parse PATTERN at: {pattern[pos:]!r}"
            )
        tokens.append((m.group(1), m.group(2)))
        pos = m.end()
    if not tokens:
        raise MatchRecognizeError("empty PATTERN")
    names = [v for v, _ in tokens]
    if len(set(n.lower() for n in names)) != len(names):
        raise MatchRecognizeError(f"duplicate pattern variables: {names}")

    within = None
    wm = _INTERVAL_RE.search(body)
    if wm:
        within = f"{wm.group(1)} {wm.group(2).lower()}"

    defines: dict[str, str] = {}
    dm = re.search(
        r"\bDEFINE\b(.*?)(?=\bWITHIN\b|$)", body, re.IGNORECASE | re.DOTALL
    )
    if dm:
        # split on ", var AS" boundaries so commas inside conditions
        # (function calls, IN lists) survive
        parts = re.split(
            rf",\s*(?=({_IDENT})\s+AS\s)", dm.group(1), flags=re.IGNORECASE
        )
        chunks = [parts[0]] + [
            p for p in parts[1:] if p and not re.fullmatch(_IDENT, p)
        ]
        for chunk in chunks:
            em = re.match(
                rf"\s*({_IDENT})\s+AS\s+(.+?)\s*$",
                chunk,
                re.IGNORECASE | re.DOTALL,
            )
            if not em:
                raise MatchRecognizeError(
                    f"cannot parse DEFINE entry: {chunk.strip()!r}"
                )
            var = em.group(1).lower()
            if var not in (n.lower() for n in names):
                raise MatchRecognizeError(
                    f"DEFINE {em.group(1)}: not a PATTERN variable "
                    f"(pattern has {names})"
                )
            if var in defines:
                raise MatchRecognizeError(f"duplicate DEFINE for {var}")
            defines[var] = em.group(2)

    names_lower = [n.lower() for n in names]
    # validate everything BEFORE building Column predicates (F.expr
    # needs an active session; rejections must not)
    parsed = []
    for var, quant in tokens:
        cond_sql = defines.get(var.lower())
        rel = None
        if cond_sql is not None:
            cond_sql, rel = _extract_rel(var, cond_sql, names_lower)
        parsed.append((var, cond_sql, rel, _parse_quant(var, quant)))
    for var, _, _, (lo, _) in (parsed[0], parsed[-1]):
        if lo == 0:
            raise MatchRecognizeError(
                f"{var}: optional quantifiers (?, *, {{0,n}}) are "
                "supported only at interior PATTERN positions — the "
                "first and last variable must match at least one row "
                "(strict-contiguity realization union; the "
                "relaxed_nfa builder mode accepts optional edges)"
            )
    if measures:
        fixed = {"user_id", "match_start", "match_end"} | {
            f"n_{n}" for n in names_lower
        }
        for alias, _, var in measures:
            if var not in names_lower:
                raise MatchRecognizeError(
                    f"MEASURES {alias}: {var!r} is not a PATTERN "
                    f"variable (pattern has {names_lower})"
                )
            if alias.lower() in fixed:
                raise MatchRecognizeError(
                    f"MEASURES alias {alias!r} collides with a fixed "
                    "output column"
                )
    stages = []
    for var, cond_sql, rel, (lo, hi) in parsed:
        predicate = F.expr(cond_sql) if cond_sql is not None else F.lit(True)
        stages.append(
            PatternStage(
                var.lower(), predicate, min_count=lo, max_count=hi, rel=rel
            )
        )
    return stages, within, measures


def match_recognize(events: DataFrame, sql: str) -> DataFrame:
    """Run a MATCH_RECOGNIZE clause against an events frame: parse via
    :func:`compile_match_recognize`, execute via the NFA-equivalent
    pattern builder. Strict contiguity, AFTER MATCH SKIP PAST LAST
    ROW — the clause's defaults. Navigation-free clauses compile to
    the declarative islands plan; PREV()/FIRST() DEFINE clauses need
    per-branch state and compile to the strict machine mode
    (``contiguity="strict_nfa"``) — row-identical semantics, pinned
    differentially in tests/test_relaxed_nfa.py."""
    stages, within, measures = compile_match_recognize(sql)
    contiguity = (
        "strict_nfa"
        if measures is not None or any(s.rel is not None for s in stages)
        else "strict"
    )
    mspec = None
    if measures is not None:
        mspec = [(alias, kind, var) for alias, kind, var in measures]
    return cep_match_pattern(events, stages, within=within,
                             contiguity=contiguity, measures=mspec)
