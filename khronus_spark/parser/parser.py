"""Tokenizer + recursive-descent parser for the InfluxQL-0.8 dialect.

Grammar re-derived from the reference combinator grammar
(`parser/InfluxQueryParser.scala:59-260`), including its quirks:

- `group by time(...)` is pre-rewritten to `group_by_time(...)` because
  `time` is also the WHERE identifier (`InfluxQueryParser.scala:52`).
- projection separators (commas) are optional; projections may also be
  space-separated (`rep(... <~ opt(Separator))`).
- `now()` is resolved to a concrete epoch-ms at **parse time**
  (`InfluxQueryParser.scala:176-197`); inject `now_ms` for determinism.
- bare numbers in time filters are epoch millis; suffixes s/m/h/d/w are
  supported there (no `ms`), while `group by time()` accepts ms/s/m/h
  and silently drops a fractional part (`InfluxQueryParser.scala:199-221`).
- `>` / `<` shift the slice edge by ±1ms at plan time, not here
  (`InfluxQueryResolver.scala:67-85`).
- percentile selectors must be one of 50 80 90 95 99 999
  (`InfluxQueryParser.scala:126-142`).
"""

from __future__ import annotations

import re
import time as _time
from dataclasses import dataclass

from khronus_spark.functions.summary import (
    ALL_HISTOGRAM_FUNCTIONS,
    ALL_PERCENTILES,
    PERCENTILE_BY_VALUE,
)
from khronus_spark.parser.ast import (
    AllField,
    Field,
    GroupBy,
    Number,
    Operation,
    ParsedQuery,
    Projection,
    StringFilter,
    Table,
    TimeFilter,
)

# count min max mean cpm p50..p999, plus the `delta` extension (the
# per-mtype validity split lives in plans/criteria.py)
FUNCTION_NAMES = set(ALL_HISTOGRAM_FUNCTIONS) | {"delta"}

_TIME_SUFFIX_MS = {"s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000, "w": 604_800_000}
_WINDOW_SUFFIX_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}


class QueryParseError(Exception):
    pass


class _CommittedParseError(QueryParseError):
    """A parse error past a committed keyword — backtracking (`_try`)
    must not swallow it (e.g. `percentiles(12)`: once `percentiles` is
    consumed with an open paren, an invalid selector is a hard error,
    `InfluxQueryParser.scala:137-142`)."""


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<num>\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<delim><=|>=|<>|[<>=*+\-/(),.;])
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Tok:
    kind: str  # string | num | ident | delim
    text: str


def tokenize(query: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if not m:
            raise QueryParseError(f"Unsupported query [{query}]: bad token at {pos}: {query[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "string":
            text = text[1:-1]
        toks.append(Tok(kind, text))
    return toks


class InfluxQueryParser:
    """Parses one query string into a ParsedQuery (IR #1)."""

    def __init__(self, now_ms: int | None = None):
        self._now_ms = now_ms

    @property
    def now_ms(self) -> int:
        # without an injected clock, the FIRST read is cached for the
        # life of this parser instance (one instance per parse in the
        # engine): two now() terms in one WHERE clause must resolve to
        # the SAME instant, or a from/to pair straddling a bucket
        # boundary between two clock reads disagrees about "now" (r13
        # review — the engine's sql() already injects one read; this
        # closes the same hole for direct parser users)
        if self._now_ms is None:
            self._now_ms = int(_time.time() * 1000)
        return self._now_ms

    def parse(self, query: str) -> ParsedQuery:
        # Same pre-rewrite hack as the reference (InfluxQueryParser.scala:52),
        # but restricted to text OUTSIDE quoted spans so a metric named
        # e.g. "group by timers" survives intact (deliberate divergence:
        # the reference's blind String.replace mangles quoted names
        # too). The quoted-span scan is ESCAPE-AWARE, exactly like the
        # tokenizer's (r13 review, verified by execution: "[^\"]*" used
        # to stop at an escaped quote, so the rewrite fired INSIDE a
        # metric name like "foo\"group by timers\"bar" and corrupted
        # it — the two scanners must agree on where strings end).
        q = re.sub(
            r"""("(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')|group by time""",
            lambda m: m.group(1) if m.group(1) else "group_by_time",
            query,
        )
        self.toks = tokenize(q)
        self.i = 0
        try:
            result = self._query()
        except QueryParseError:
            raise
        except Exception as e:  # uniform error surface, like the reference
            raise QueryParseError(f"Unsupported query [{query}]: {e}") from e
        if self.i != len(self.toks):
            raise QueryParseError(
                f"Unsupported query [{query}]: trailing tokens at {self._peek()}"
            )
        return result

    # -- token helpers -----------------------------------------------------

    def _peek(self, ahead: int = 0) -> Tok | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> Tok:
        t = self._peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return t

    def _accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self._peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return t
        return None

    def _expect(self, kind: str, text: str | None = None) -> Tok:
        t = self._accept(kind, text)
        if t is None:
            raise QueryParseError(f"expected {text or kind}, got {self._peek()}")
        return t

    def _accept_kw(self, word: str) -> bool:
        return self._accept("ident", word) is not None

    # -- grammar -----------------------------------------------------------

    def _query(self) -> ParsedQuery:
        self._expect("ident", "select")
        projections = self._projections()
        self._expect("ident", "from")
        tables = self._tables()
        filters: tuple = ()
        if self._accept_kw("where"):
            filters = self._filters()
        force = self._accept_kw("force")
        group_by = self._group_by(force)
        fill = scale = None
        limit = None
        order_asc = True
        if self._accept_kw("fill"):
            self._expect("delim", "(")
            # fill(linear) interpolates gaps between known neighbours
            # (an InfluxQL-compatible extension; the reference's fill
            # only takes a number)
            fill = "linear" if self._accept_kw("linear") else self._double()
            self._expect("delim", ")")
        if self._accept_kw("scale"):
            self._expect("delim", "(")
            scale = self._double()
            self._expect("delim", ")")
        if self._accept_kw("limit"):
            limit = int(self._expect("num").text)
        if self._accept_kw("order"):
            if self._accept_kw("asc"):
                order_asc = True
            elif self._accept_kw("desc"):
                order_asc = False
            else:
                raise QueryParseError("expected asc|desc after order")
        self._accept("delim", ";")
        return ParsedQuery(
            projections=projections,
            tables=tables,
            filters=filters,
            group_by=group_by,
            fill=fill,
            scale=scale,
            limit=limit,
            order_asc=order_asc,
        )

    # projections ----------------------------------------------------------

    def _projections(self) -> tuple[Projection, ...]:
        star = self._try(self._all_field)
        if star is not None:
            return (star,)
        out: list[Projection] = []
        while True:
            got = self._try(self._projection_expression)
            if got is None:
                break
            out.extend(got)
            self._accept("delim", ",")
        if not out:
            raise QueryParseError("expected at least one projection")
        return tuple(out)

    def _all_field(self) -> AllField:
        save = self.i
        alias = None
        t = self._peek()
        if t and t.kind == "ident" and self._peek(1) and self._peek(1).text == "." and t.text not in FUNCTION_NAMES:
            alias = self._next().text
            self._next()  # '.'
        if self._accept("delim", "*"):
            return AllField(alias)
        self.i = save
        raise QueryParseError("not all-field")

    def _projection_expression(self) -> list[Projection]:
        # alias-qualified or bare `percentiles` expansion
        got = self._try(self._percentiles_projection)
        if got is not None:
            return got
        proj = self._try(self._operation) or self._try(self._simple_function) or self._try(self._scalar)
        if proj is None:
            raise QueryParseError("expected projection")
        return [proj]

    def _percentiles_projection(self) -> list[Projection]:
        save = self.i
        alias = None
        t = self._peek()
        if t and t.kind == "ident" and t.text != "percentiles" and self._peek(1) and self._peek(1).text == ".":
            alias = self._next().text
            self._next()
        if not self._accept_kw("percentiles"):
            self.i = save
            raise QueryParseError("not percentiles")
        names = list(ALL_PERCENTILES)
        if self._accept("delim", "("):
            sel = []
            while (n := self._accept("num")) is not None:
                v = int(n.text)
                if v not in PERCENTILE_BY_VALUE:
                    raise _CommittedParseError(
                        f"invalid percentile {v}; valid: {sorted(PERCENTILE_BY_VALUE)}"
                    )
                sel.append(PERCENTILE_BY_VALUE[v])
            try:
                self._expect("delim", ")")
            except QueryParseError as e:
                # the keyword + open paren are COMMITTED (class
                # docstring): letting this backtrack surfaced an
                # unrelated "expected at least one projection" for
                # e.g. comma-separated selectors (r13 review,
                # verified) — name the actual problem instead
                raise _CommittedParseError(
                    "percentiles(...) selectors are space-separated "
                    f"numbers; {e}"
                ) from e
            if sel:
                names = sel
        return [Field(name, None, alias) for name in names]

    def _simple_function(self) -> Field:
        save = self.i
        alias = None
        t = self._peek()
        if (
            t
            and t.kind == "ident"
            and t.text not in FUNCTION_NAMES
            and self._peek(1)
            and self._peek(1).text == "."
        ):
            alias = self._next().text
            self._next()
        fn = self._peek()
        if not (fn and fn.kind == "ident" and fn.text in FUNCTION_NAMES):
            self.i = save
            raise QueryParseError("not a function")
        self._next()
        # optional empty-ish parens: count(value)  (InfluxQueryParser.scala:118-124)
        if self._accept("delim", "("):
            self._accept("ident")
            self._expect("delim", ")")
        as_alias = None
        if self._accept_kw("as"):
            as_alias = self._expect("ident").text
        return Field(fn.text, as_alias, alias)

    def _scalar(self) -> Number:
        value = self._double()
        self._expect("ident", "as")
        alias = self._expect("ident").text
        return Number(value, alias)

    def _operation(self) -> Operation:
        left = self._operand()
        op = self._peek()
        if not (op and op.kind == "delim" and op.text in "+-*/"):
            raise QueryParseError("not an operation")
        self._next()
        right = self._operand()
        self._expect("ident", "as")
        alias = self._expect("ident").text
        return Operation(left, right, op.text, alias)

    def _operand(self) -> Field | Number:
        t = self._peek()
        if (
            t
            and t.kind == "ident"
            and self._peek(1)
            and self._peek(1).text == "."
            and self._peek(2)
            and self._peek(2).kind == "ident"
            and self._peek(2).text in FUNCTION_NAMES
        ):
            alias = self._next().text
            self._next()
            fn = self._next().text
            return Field(fn, None, alias)
        return Number(self._double())

    # FROM -----------------------------------------------------------------

    def _tables(self) -> tuple[Table, ...]:
        out: list[Table] = []
        while (t := self._accept("string")) is not None:
            alias = None
            if self._accept_kw("as"):
                alias = self._expect("ident").text
            out.append(Table(t.text, alias))
            self._accept("delim", ",")
        if not out:
            raise QueryParseError("expected FROM table")
        return tuple(out)

    # WHERE ----------------------------------------------------------------

    def _filters(self) -> tuple:
        out = []
        while True:
            f = (
                self._try(self._time_between)
                or self._try(self._time_comparator)
                or self._try(self._string_filter)
            )
            if f is None:
                break
            out.extend(f)
            self._accept_kw("and")
        return tuple(out)

    def _string_filter(self) -> list[StringFilter]:
        ident = self._peek()
        if not (ident and ident.kind == "ident" and ident.text != "time"):
            raise QueryParseError("not string filter")
        self._next()
        op = self._accept("delim", "=") or self._accept("delim", "<>")
        if op is None:
            raise QueryParseError("expected = or <>")
        val = self._expect("string")
        return [StringFilter(ident.text, op.text, val.text)]

    def _time_comparator(self) -> list[TimeFilter]:
        if not self._accept("ident", "time"):
            raise QueryParseError("not time filter")
        op = (
            self._accept("delim", "<=")
            or self._accept("delim", ">=")
            or self._accept("delim", "<")
            or self._accept("delim", ">")
        )
        if op is None:
            raise QueryParseError("expected comparison operator")
        if self._accept_kw("now"):
            self._expect("delim", "(")
            self._expect("delim", ")")
            delta = 0
            if self._accept("delim", "-"):
                delta = self._time_value()
            return [TimeFilter(op.text, self.now_ms - delta)]
        return [TimeFilter(op.text, self._time_value())]

    def _time_between(self) -> list[TimeFilter]:
        if not self._accept("ident", "time"):
            raise QueryParseError("not time between")
        if not self._accept_kw("between"):
            raise QueryParseError("not between")
        a = self._time_value()
        self._expect("ident", "and")
        b = self._time_value()
        return [TimeFilter(">=", a), TimeFilter("<=", b)]

    def _time_value(self) -> int:
        n = int(self._expect("num").text)
        t = self._peek()
        if t and t.kind == "ident" and t.text in _TIME_SUFFIX_MS:
            self._next()
            return n * _TIME_SUFFIX_MS[t.text]
        return n  # bare number = epoch millis

    # GROUP BY -------------------------------------------------------------

    def _group_by(self, force: bool) -> GroupBy:
        self._expect("ident", "group_by_time")
        self._expect("delim", "(")
        n = int(self._expect("num").text)
        # fractional windows are parsed and truncated (reference quirk,
        # InfluxQueryParser.scala:228-246)
        if self._accept("delim", "."):
            self._accept("num")
        suffix = self._expect("ident").text
        if suffix not in _WINDOW_SUFFIX_MS:
            raise QueryParseError(f"bad window suffix {suffix!r}")
        self._expect("delim", ")")
        return GroupBy(n * _WINDOW_SUFFIX_MS[suffix], force)

    # misc -----------------------------------------------------------------

    def _double(self) -> float:
        neg = self._accept("delim", "-") is not None
        whole = self._expect("num").text
        frac = ""
        save = self.i
        if self._accept("delim", "."):
            f = self._accept("num")
            if f is None:
                self.i = save
            else:
                frac = f".{f.text}"
        return float(f"{'-' if neg else ''}{whole}{frac}")

    def _try(self, fn):
        save = self.i
        try:
            return fn()
        except _CommittedParseError:
            raise
        except QueryParseError:
            self.i = save
            return None
