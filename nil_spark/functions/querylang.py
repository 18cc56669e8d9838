"""Boolean query language: one parser, three backends.

A small search DSL over tokenized documents —

    expr   := or
    or     := and ( OR and )*
    and    := unary ( AND unary )*          (AND may also be implicit:
                                             two adjacent unaries conjoin)
    unary  := NOT unary | atom
    atom   := '(' expr ')' | '"' word+ '"' | word
            | ATLEAST '(' n ',' expr (',' expr)* ')'
            | field ':' value                 (keyword term filter)
            | field ':[' (num|'*') TO (num|'*') ']'   (numeric range)

— parsed once into an AST, then compiled to (a) a PySpark boolean
``Column`` over a tokenized-documents relation, (b) an equivalent
DuckDB SQL boolean expression, and (c) a pure-Python evaluator used as
the property-test oracle.  The three backends share ONE semantic
definition:

 * a bare word matches documents whose token list contains it;
 * a quoted phrase matches documents containing the words ADJACENT and
   in order (Lucene phrase-query semantics at slop 0);
 * AND / OR / NOT are set intersection / union / complement over the
   matched doc sets;
 * ATLEAST(n, e1, ..., em) matches documents satisfying at least n of
   the m sub-expressions — Lucene's minimum_should_match on a boolean
   query (n=1 degrades to OR, n=m to AND);
 * field:value / field:[lo TO hi] are ES FILTER-context predicates
   over metadata fields (keyword equality, unanalyzed and
   case-sensitive / inclusive numeric range, '*' = open end,
   [* TO *] = exists).  They never contribute scoring terms, and a
   null field value never matches — so NOT field:v matches nulls,
   complement semantics in every backend.  The engine backend
   resolves them from the doc-values side-car stores
   (operators/docvalues.py), never the corpus.

Phrase matching is implemented in all three backends as substring
containment over the space-joined token list padded with sentinel
spaces (`' ' || join(toks,' ') || ' '` contains `' a b '`) — exact
adjacent-token semantics because tokens never contain spaces (the
tokenizer splits on ``[^a-z0-9]+``).

The reference has no query language — its one "query" is the clone
pipeline itself — but its candidate counting
(`NGramBasedLocation.kt:10-15`) is an implicit conjunctive query; this
module exposes the boolean algebra a user of a full-text index
actually types.  Grammar shape follows Lucene's classic QueryParser
(public knowledge), restricted to the operators our index serves
exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r"|(?P<quote>\"[^\"]*\")(?:~(?P<slop>\d+))?"
    r"(?:\^(?P<qboost>\d+(?:\.\d+)?))?"
    r"|(?P<frange>[A-Za-z_][A-Za-z0-9_]*:\[[^\[\]]*\])"
    r"|(?P<fterm>[A-Za-z_][A-Za-z0-9_]*:[A-Za-z0-9_.\-]+)"
    r"|(?P<word>[A-Za-z0-9]+)(?:\^(?P<wboost>\d+(?:\.\d+)?))?)"
)

_RANGE_BOUND = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")

_WORD_SPLIT = re.compile(r"[^a-z0-9]+")


class QueryParseError(ValueError):
    pass


# ------------------------------------------------------------------ AST


@dataclass(frozen=True)
class Term:
    word: str
    boost: float = 1.0  # query-time boost (word^2.5) — scoring only


@dataclass(frozen=True)
class Phrase:
    words: tuple
    slop: int = 0  # ordered width slack: match iff pos_m - pos_1 <= slop + m - 1
    boost: float = 1.0  # "a b"~n^2 — scales every member's BM25 term


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class AtLeast:
    """minimum_should_match: at least ``n`` of ``children`` hold."""

    n: int
    children: tuple


@dataclass(frozen=True)
class FieldTerm:
    """``field:value`` — ES keyword term FILTER: exact, unanalyzed
    equality on a metadata field.  Filter context: matches or not,
    contributes no BM25 scoring terms.  A null/missing field value
    never matches (so NOT field:v matches null — complement
    semantics, pinned across all backends)."""

    field: str
    value: str


@dataclass(frozen=True)
class FieldRange:
    """``field:[lo TO hi]`` — ES numeric range FILTER, bounds
    INCLUSIVE, ``*`` for an open end.  ``field:[* TO *]`` degrades to
    the ES ``exists`` query (any non-null value).  Null/NaN never
    matches.  Filter context (no scoring terms)."""

    field: str
    lo: float | None
    hi: float | None


# ------------------------------------------------------------- parsing


def _lex(text: str) -> list:
    out, pos = [], 0
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise QueryParseError(f"bad character at {pos}: {text[pos]!r}")
        pos = m.end()
        if m.group("word") is not None:
            w = m.group("word")
            b = m.group("wboost")
            up = w.upper()
            if b is None and up in ("AND", "OR", "NOT", "ATLEAST"):
                out.append((up, up))
            else:
                out.append(
                    ("WORD", (w.lower(), float(b) if b else 1.0))
                )
        elif m.group("quote") is not None:
            words = [w for w in _WORD_SPLIT.split(m.group("quote").strip('"').lower()) if w]
            if not words:
                raise QueryParseError("empty phrase")
            slop = int(m.group("slop")) if m.group("slop") else 0
            qb = m.group("qboost")
            out.append(
                ("PHRASE", (tuple(words), slop, float(qb) if qb else 1.0))
            )
        elif m.lastgroup == "frange":
            raw = m.group("frange")
            field, _, body = raw.partition(":")
            parts = re.split(r"\s+TO\s+", body[1:-1].strip(), flags=re.I)
            if len(parts) != 2:
                raise QueryParseError(
                    f"range needs '[lo TO hi]', got {raw!r}"
                )

            def bound(s: str, raw=raw):
                s = s.strip()
                if s == "*":
                    return None
                if not _RANGE_BOUND.match(s):
                    raise QueryParseError(
                        f"bad range bound {s!r} in {raw!r} (number or *)"
                    )
                return float(s)

            lo, hi = bound(parts[0]), bound(parts[1])
            if lo is not None and hi is not None and lo > hi:
                raise QueryParseError(f"empty range {raw!r} (lo > hi)")
            out.append(("FRANGE", (field.lower(), lo, hi)))
        elif m.lastgroup == "fterm":
            raw = m.group("fterm")
            field, _, value = raw.partition(":")
            out.append(("FTERM", (field.lower(), value)))
        elif m.lastgroup == "lparen":
            out.append(("(", "("))
        elif m.lastgroup == "comma":
            out.append((",", ","))
        else:
            out.append((")", ")"))
    return out


class _Parser:
    def __init__(self, toks: list):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.i != len(self.toks):
            raise QueryParseError(f"trailing input at token {self.i}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == "OR":
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self):
        parts = [self.unary()]
        while True:
            p = self.peek()
            if p == "AND":
                self.next()
                parts.append(self.unary())
            elif p in ("WORD", "PHRASE", "NOT", "(", "ATLEAST",
                       "FTERM", "FRANGE"):
                # implicit AND between adjacent atoms
                parts.append(self.unary())
            else:
                break
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self):
        if self.peek() == "NOT":
            self.next()
            return Not(self.unary())
        return self.atom()

    def atom(self):
        p = self.peek()
        if p == "ATLEAST":
            self.next()
            if self.peek() != "(":
                raise QueryParseError("ATLEAST needs '('")
            self.next()
            t, v = self.next() if self.i < len(self.toks) else (None, None)
            if t != "WORD" or not v[0].isdigit() or v[1] != 1.0:
                raise QueryParseError("ATLEAST needs a leading integer")
            n = int(v[0])
            children = []
            while self.peek() == ",":
                self.next()
                children.append(self.or_expr())
            if self.peek() != ")":
                raise QueryParseError("missing ')' in ATLEAST")
            self.next()
            if not children:
                raise QueryParseError("ATLEAST needs at least one clause")
            if not (1 <= n <= len(children)):
                raise QueryParseError(
                    f"ATLEAST n={n} out of range 1..{len(children)}"
                )
            if n == len(children):
                return children[0] if n == 1 else And(tuple(children))
            if n == 1:
                return Or(tuple(children))
            return AtLeast(n, tuple(children))
        if p == "(":
            self.next()
            node = self.or_expr()
            if self.peek() != ")":
                raise QueryParseError("missing ')'")
            self.next()
            return node
        if p == "WORD":
            w, b = self.next()[1]
            return Term(w, b)
        if p == "FTERM":
            f, v = self.next()[1]
            return FieldTerm(f, v)
        if p == "FRANGE":
            f, lo, hi = self.next()[1]
            return FieldRange(f, lo, hi)
        if p == "PHRASE":
            words, slop, b = self.next()[1]
            return (
                Phrase(words, slop, b)
                if len(words) > 1
                else Term(words[0], b)
            )
        raise QueryParseError(f"unexpected token {p}")


def parse_query(text: str):
    """Parse the DSL string into an AST. Raises QueryParseError."""
    toks = _lex(text)
    if not toks:
        raise QueryParseError("empty query")
    return _Parser(toks).parse()


# ------------------------------------------------------ AST utilities


def analyze_ast(node, cfg):
    """Rewrite every Term/Phrase word through the config's analysis
    chain (functions/tokenize.apply_analyzer) — required before
    executing a DSL query against an index built with a non-standard
    analyzer: the index holds analyzed terms, so unanalyzed query words
    would silently never match.  No-op for the standard analyzer."""
    if getattr(cfg, "analyzer", "standard") == "standard":
        return node
    from nil_spark.functions.tokenize import apply_analyzer

    def an(w: str) -> str:
        return apply_analyzer([w], cfg)[0]

    if isinstance(node, Term):
        return Term(an(node.word), node.boost)
    if isinstance(node, (FieldTerm, FieldRange)):
        return node  # keyword/numeric filters are never analyzed (ES)
    if isinstance(node, Phrase):
        return Phrase(
            tuple(an(w) for w in node.words), node.slop, node.boost
        )
    if isinstance(node, Not):
        return Not(analyze_ast(node.child, cfg))
    if isinstance(node, And):
        return And(tuple(analyze_ast(c, cfg) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(analyze_ast(c, cfg) for c in node.children))
    if isinstance(node, AtLeast):
        return AtLeast(
            node.n, tuple(analyze_ast(c, cfg) for c in node.children)
        )
    raise TypeError(f"unknown AST node {node!r}")


def positive_terms(node) -> list:
    """Distinct words contributing POSITIVE evidence (not under NOT) —
    the BM25 scoring terms for a matched-doc ranking.  Phrase members
    count as terms (Lucene scores phrase hits through their terms).
    Sorted for determinism."""
    out: set = set()

    def walk(n, neg: bool):
        if isinstance(n, Term):
            if not neg:
                out.add(n.word)
        elif isinstance(n, Phrase):
            if not neg:
                out.update(n.words)
        elif isinstance(n, Not):
            walk(n.child, not neg)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c, neg)
        # FieldTerm / FieldRange: filter context, no scoring terms

    walk(node, False)
    return sorted(out)


def positive_term_boosts(node) -> dict:
    """word → effective query-time boost for scoring: the SUM of the
    boosts of the word's positive occurrences (a bare Term contributes
    its own boost; every member of a boosted Phrase contributes the
    phrase's boost) — Lucene's behavior, where ``a^2 OR a`` creates two
    scorers whose contributions add.  Words only under NOT contribute
    nothing (same rule as positive_terms).  All-1.0 queries yield the
    exact unboosted scoring, so the boost path is a strict superset."""
    out: dict = {}

    def walk(n, neg: bool):
        if isinstance(n, Term):
            if not neg:
                out[n.word] = out.get(n.word, 0.0) + n.boost
        elif isinstance(n, Phrase):
            if not neg:
                for w in n.words:
                    out[w] = out.get(w, 0.0) + n.boost
        elif isinstance(n, Not):
            walk(n.child, not neg)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c, neg)

    walk(node, False)
    return out


def field_predicates(node) -> set:
    """The ``(kind, field)`` pairs a query touches — kind is
    ``"keyword"`` (FieldTerm) or ``"numeric"`` (FieldRange).  Callers
    use this to resolve/validate the doc-values stores a query
    needs before executing it."""
    out: set = set()
    if isinstance(node, FieldTerm):
        out.add(("keyword", node.field))
    elif isinstance(node, FieldRange):
        out.add(("numeric", node.field))
    elif isinstance(node, Not):
        out |= field_predicates(node.child)
    elif isinstance(node, (And, Or, AtLeast)):
        for c in node.children:
            out |= field_predicates(c)
    return out


# ------------------------------------------------------ backend: Spark


def compile_spark(node, toks_col, padded_col, field_cols=None):
    """Compile to a PySpark boolean Column.

    ``toks_col``   — ArrayType(StringType) token-list Column;
    ``padded_col`` — the space-padded joined string Column
                     (``' ' || array_join(toks,' ') || ' '``), passed
                     in so the concat is built once per relation, not
                     once per phrase node;
    ``field_cols`` — dict field-name → Column for FieldTerm/FieldRange
                     predicates (keyword fields as strings, numeric
                     fields castable to double).  Field predicates are
                     compiled null-safe (null never matches, so NOT
                     over a null field matches — complement semantics,
                     identical to the engine backend's doc-values
                     evaluation).
    """
    from pyspark.sql import functions as F

    def fcol(f):
        if not field_cols or f not in field_cols:
            raise QueryParseError(
                f"unknown field {f!r} (available: "
                f"{sorted(field_cols or {})})"
            )
        return field_cols[f]

    if isinstance(node, Term):
        return F.array_contains(toks_col, node.word)
    if isinstance(node, FieldTerm):
        return fcol(node.field).cast("string").eqNullSafe(
            F.lit(node.value)
        )
    if isinstance(node, FieldRange):
        col = fcol(node.field).cast("double")
        cond = ~F.isnan(col) & col.isNotNull()
        if node.lo is not None:
            cond = cond & (col >= F.lit(node.lo))
        if node.hi is not None:
            cond = cond & (col <= F.lit(node.hi))
        return F.coalesce(cond, F.lit(False))
    if isinstance(node, Phrase):
        if node.slop == 0:
            return padded_col.contains(" " + " ".join(node.words) + " ")
        # sloppy: nested EXISTS over per-word position arrays (nested
        # higher-order lambdas capture outer positions — whole-stage
        # JVM evaluation, no UDF)
        width = F.lit(node.slop + len(node.words) - 1)

        def pos_arr(w):
            return F.filter(
                F.transform(
                    toks_col,
                    lambda x, i: F.when(x == w, i).otherwise(F.lit(-1)),
                ),
                lambda q: q >= 0,
            )

        def chain(j, prev, first):
            arr = pos_arr(node.words[j])
            if j == len(node.words) - 1:
                return F.exists(
                    arr, lambda q: (q > prev) & ((q - first) <= width)
                )
            return F.exists(
                arr, lambda q: (q > prev) & chain(j + 1, q, first)
            )

        return F.exists(
            pos_arr(node.words[0]), lambda q: chain(1, q, q)
        )
    if isinstance(node, Not):
        return ~compile_spark(node.child, toks_col, padded_col, field_cols)
    if isinstance(node, And):
        out = compile_spark(node.children[0], toks_col, padded_col,
                            field_cols)
        for c in node.children[1:]:
            out = out & compile_spark(c, toks_col, padded_col, field_cols)
        return out
    if isinstance(node, Or):
        out = compile_spark(node.children[0], toks_col, padded_col,
                            field_cols)
        for c in node.children[1:]:
            out = out | compile_spark(c, toks_col, padded_col, field_cols)
        return out
    if isinstance(node, AtLeast):
        total = None
        for c in node.children:
            term = compile_spark(
                c, toks_col, padded_col, field_cols
            ).cast("int")
            total = term if total is None else total + term
        return total >= node.n
    raise TypeError(f"unknown AST node {node!r}")


# ------------------------------------------------------- backend: SQL


def compile_duckdb(
    node, toks_expr: str, padded_expr: str, field_exprs=None
) -> str:
    """Compile to a DuckDB boolean SQL expression over ``toks_expr``
    (a VARCHAR[] expression) and ``padded_expr`` (the space-padded
    joined string expression).  ``field_exprs`` maps field name → SQL
    expression for FieldTerm/FieldRange (keyword fields as VARCHAR,
    numeric fields as DOUBLE-comparable, e.g. ``epoch(ts)``); field
    predicates compile null-safe via ``coalesce(..., FALSE)`` so NOT
    over a null field matches (complement semantics)."""

    def fexpr(f):
        if not field_exprs or f not in field_exprs:
            raise QueryParseError(
                f"unknown field {f!r} (available: "
                f"{sorted(field_exprs or {})})"
            )
        return field_exprs[f]

    if isinstance(node, Term):
        return f"list_contains({toks_expr}, '{node.word}')"
    if isinstance(node, FieldTerm):
        v = node.value.replace("'", "''")
        return (
            f"coalesce(CAST({fexpr(node.field)} AS VARCHAR) = '{v}', FALSE)"
        )
    if isinstance(node, FieldRange):
        e = fexpr(node.field)
        conds = [f"NOT isnan(CAST({e} AS DOUBLE))"]
        if node.lo is not None:
            conds.append(f"{e} >= {node.lo!r}")
        if node.hi is not None:
            conds.append(f"{e} <= {node.hi!r}")
        return f"coalesce({' AND '.join(conds)}, FALSE)"
    if isinstance(node, Phrase):
        if node.slop == 0:
            ph = " ".join(node.words)
            return f"contains({padded_expr}, ' {ph} ')"
        width = node.slop + len(node.words) - 1

        def pos_list(w):
            return (
                f"[i FOR i IN range(1, len({toks_expr})+1) "
                f"IF {toks_expr}[i] = '{w}']"
            )

        def chain(j):
            if j == len(node.words) - 1:
                return (
                    f"len(list_filter({pos_list(node.words[j])}, "
                    f"p{j} -> p{j} > p{j-1} AND p{j} - p0 <= {width})) > 0"
                )
            return (
                f"len(list_filter({pos_list(node.words[j])}, "
                f"p{j} -> p{j} > p{j-1} AND ({chain(j + 1)}))) > 0"
            )

        return (
            f"(len(list_filter({pos_list(node.words[0])}, "
            f"p0 -> {chain(1)})) > 0)"
        )
    if isinstance(node, Not):
        inner = compile_duckdb(node.child, toks_expr, padded_expr,
                               field_exprs)
        return f"(NOT {inner})"
    if isinstance(node, And):
        inner = " AND ".join(
            compile_duckdb(c, toks_expr, padded_expr, field_exprs)
            for c in node.children
        )
        return f"({inner})"
    if isinstance(node, Or):
        inner = " OR ".join(
            compile_duckdb(c, toks_expr, padded_expr, field_exprs)
            for c in node.children
        )
        return f"({inner})"
    if isinstance(node, AtLeast):
        inner = " + ".join(
            f"({compile_duckdb(c, toks_expr, padded_expr, field_exprs)})::INT"
            for c in node.children
        )
        return f"(({inner}) >= {node.n})"
    raise TypeError(f"unknown AST node {node!r}")


# ---------------------------------------------------- backend: Python


def eval_python(node, toks: list, fields: dict | None = None) -> bool:
    """Pure-Python oracle evaluator over one document's token list.
    ``fields`` maps field name → value (str for keyword fields, number
    for numeric; None/NaN never matches a field predicate)."""
    if isinstance(node, Term):
        return node.word in toks
    if isinstance(node, FieldTerm):
        v = (fields or {}).get(node.field)
        return v is not None and str(v) == node.value
    if isinstance(node, FieldRange):
        v = (fields or {}).get(node.field)
        if v is None:
            return False
        v = float(v)
        if v != v:  # NaN
            return False
        return (node.lo is None or v >= node.lo) and (
            node.hi is None or v <= node.hi
        )
    if isinstance(node, Phrase):
        n = len(node.words)
        w = list(node.words)
        if node.slop == 0:
            return any(toks[i : i + n] == w for i in range(len(toks) - n + 1))
        # ordered sloppy match: positions in order with total width
        # pos_n - pos_1 <= slop + n - 1.  Greedy-earliest chaining from
        # each start is complete: any valid chain's greedy counterpart
        # has pointwise-smaller positions, hence smaller width.
        import bisect

        pos = [[i for i, t in enumerate(toks) if t == ww] for ww in w]
        if any(not pl for pl in pos):
            return False
        width = node.slop + n - 1
        for p1 in pos[0]:
            cur, ok = p1, True
            for pl in pos[1:]:
                j = bisect.bisect_right(pl, cur)
                if j == len(pl):
                    ok = False
                    break
                cur = pl[j]
            if ok and cur - p1 <= width:
                return True
        return False
    if isinstance(node, Not):
        return not eval_python(node.child, toks, fields)
    if isinstance(node, And):
        return all(eval_python(c, toks, fields) for c in node.children)
    if isinstance(node, Or):
        return any(eval_python(c, toks, fields) for c in node.children)
    if isinstance(node, AtLeast):
        return (
            sum(eval_python(c, toks, fields) for c in node.children)
            >= node.n
        )
    raise TypeError(f"unknown AST node {node!r}")
