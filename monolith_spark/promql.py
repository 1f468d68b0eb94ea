"""PromQL text front-end: parse → evaluate on Spark DataFrames.

The reference is a Prometheus REMOTE-STORAGE backend: PromQL itself is
evaluated by the Prometheus client, the reference only serves raw
matcher+range reads (/root/reference/README.md:7, src/server.rs:76-113;
the func/step ReadHints are parsed but unread,
/root/reference/src/proto/types.rs:1248-1257). This engine already
evaluates the function surface server-side (workload.py ts_* rows,
operators/timeseries.py builders); this module adds the missing text
entry so the surface is self-serve: a query string goes in, a
DataFrame comes out.

Scope and semantics (documented divergences from Prometheus, chosen to
match this repo's established, oracle-verified conventions):

- Single-point INSTANT evaluation at ``eval_ms``: selectors, range
  functions, aggregations, scalar arithmetic. (A step-range API is one
  loop above this; range_func_by_step covers the hinted remote-read.)
- Range windows are INCLUSIVE on both ends — ``m[5m]`` at T reads
  ts ∈ [T-5m, T] — matching the engine's F3 inclusive trim
  (SURVEY §7.2 M1), where Prometheus uses a left-open window.
- rate() follows this repo's covered-span form (reset-corrected step
  sum over [first-step ts, last ts], ts_rate), not Prometheus's
  boundary extrapolation.
- Ordering ties break by (timestamp, value) everywhere, so duplicate
  timestamps evaluate identically on Spark and the DuckDB oracle.
- Vector-vector binary ops match 1:1 (full label set by default,
  narrowed with on/ignoring); a key matching more than one series on
  either side raises at execution — Prometheus's many-to-many error.
  group_left/group_right give many-to-one matching: extra labels are
  copied from the unique one-side partner (duplicate one-side rows
  raise at execution); a group modifier requires an explicit
  on/ignoring clause and is rejected with set operators. The set
  operators and/or/unless are keyed semi/anti/union joins. The `@`
  modifier pins a selector/subquery to a fixed unix-seconds anchor —
  or to `start()`/`end()`, which both equal the evaluation time in an
  instant query and the range bounds in a range query; eval_range
  evaluates a fully-pinned subtree once as an instant query at its
  anchors and fans the result across the step grid. Subqueries
  are supported for range-function inners (``max_over_time(rate(m[5d])
  [15d:5d])``), the shape ts_subquery_max_rate pins: the outer range
  is tiled by step-width windows anchored at the range start, the
  inner function runs isolated per window (counter resets never leak
  across evaluations).

Functions: rate increase delta idelta irate resets changes deriv
predict_linear holt_winters <agg>_over_time (avg/sum/min/max/count/
last/stddev/stdvar/present) quantile_over_time mad_over_time
ts_of_max/ts_of_min/ts_of_last_over_time (3.5 experimental)
(experimental-promql-functions) histogram_quantile
histogram_fraction (over classic le-buckets — the faithful form for
an engine that classic-expands native histograms at ingest) abs
ceil floor exp ln log2 log10 sqrt sgn round clamp clamp_min clamp_max
sin cos tan asin acos atan sinh cosh tanh deg rad pi minute hour
day_of_week day_of_month days_in_month month year timestamp sort
sort_desc sort_by_label sort_by_label_desc absent absent_over_time
scalar vector time label_replace
label_join info (3.x experimental — target_info data-label
enrichment on the (job, instance) identity, the OTLP receiver's
companion); Inf/NaN number literals; aggregation
operators sum avg min max count stddev stdvar group count_values topk
bottomk quantile limitk limit_ratio with by/without (limitk picks a
DETERMINISTIC k — ordered by md5(signature) — where the Prometheus
spec leaves the choice open; limit_ratio hash-samples on the same
md5-prefix uniform, honoring the r / -(1-r) complement contract). Matchers: EQ/NEQ/RE/NRE; ``offset``
and ``@`` on selectors/subqueries. scalar() resolves its
single-series operand driver-side
(a bounded 1-row collect — the one documented driver touch).

Scale shape: every range function is one (series, time)-sorted window
or one map-combinable aggregation per series; aggregations re-key by
the grouped label subset's signature; nothing collects to the driver.
Builder-backed functions (irate/deriv/predict_linear/holt_winters/
resets/changes) re-attach labels via a broadcast self-join on the
per-series dim (small by construction — one row per matched series).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from monolith_spark.labels import (
    LabelMatcher,
    matcher_predicate,
    signature_expr,
    signature_sql_text,
    sql_str_lit,
)
from monolith_spark.operators import timeseries as _tsops
from monolith_spark.operators.text import hash60_expr as _hash60

DEFAULT_LOOKBACK_MS = 300_000
# Tiled range-mode fan-out cap: a range function with range = k*step
# explodes each sample into the k consecutive windows it covers; k is
# bounded so a pathological range/step ratio cannot multiply the
# shuffle unboundedly (Grafana's $__rate_interval ~ 4x step fits with
# room to spare).
RANGE_TILE_MAX_K = 16
_DEC = "decimal(28,6)"

# --------------------------------------------------------------------- AST


@dataclass(frozen=True)
class Number:
    value: float


@dataclass(frozen=True)
class StringLit:
    value: str


@dataclass(frozen=True)
class Selector:
    name: str | None
    matchers: tuple[LabelMatcher, ...]
    range_ms: int | None = None  # None → instant selector
    offset_ms: int = 0
    # `@ <unix-seconds>` fixed anchor, or "start"/"end" (`@ start()`)
    at_ms: int | str | None = None


@dataclass(frozen=True)
class Subquery:
    expr: Any
    range_ms: int
    step_ms: int
    offset_ms: int = 0
    at_ms: int | str | None = None


@dataclass(frozen=True)
class Call:
    func: str
    args: tuple[Any, ...]


@dataclass(frozen=True)
class Agg:
    op: str
    expr: Any
    param: Any = None  # k for topk/bottomk, φ for quantile
    by: tuple[str, ...] | None = None
    without: tuple[str, ...] | None = None


@dataclass(frozen=True)
class BinOp:
    op: str
    lhs: Any
    rhs: Any
    bool_mode: bool = False
    # vector matching: None → match on the FULL label set;
    # ("on", labels) / ("ignoring", labels) → match on the subset
    match: tuple[str, tuple[str, ...]] | None = None
    # many-to-one matching: ("left"|"right", extra-labels-from-one-side);
    # requires an explicit on/ignoring clause (Prometheus grammar)
    group: tuple[str, tuple[str, ...]] | None = None


@dataclass(frozen=True)
class Unary:
    op: str
    expr: Any


# ------------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<DURATION>(?:\d+(?:ms|s|m|h|d|w|y))+)
  | (?P<NUMBER>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<IDENT>[a-zA-Z_][a-zA-Z0-9_:]*)
  | (?P<STRING>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<OP>=~|!~|!=|==|>=|<=|[-+*/%^(){}\[\],=<>:@])
    """,
    re.VERBOSE,
)

_DUR_UNIT_MS = {
    "ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
    "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000,
}

_AGG_OPS = {"sum", "avg", "min", "max", "count", "stddev", "stdvar",
            "group", "count_values", "topk", "bottomk", "quantile",
            "limitk", "limit_ratio"}


def parse_duration_ms(text: str) -> int:
    total, pos = 0, 0
    for m in re.finditer(r"(\d+)(ms|s|m|h|d|w|y)", text):
        if m.start() != pos:
            raise ValueError(f"bad duration: {text!r}")
        total += int(m.group(1)) * _DUR_UNIT_MS[m.group(2)]
        pos = m.end()
    if pos != len(text) or total == 0:
        raise ValueError(f"bad duration: {text!r}")
    return total


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"PromQL lex error at {text[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "WS":
            out.append((kind, m.group()))
    out.append(("EOF", ""))
    return out


# ------------------------------------------------------------------ parser

_CMP_OPS = {"==", "!=", ">", "<", ">=", "<="}
# precedence: higher binds tighter; ^ is right-associative
_BIN_PREC = {"or": 1, "and": 2, "unless": 2,
             "==": 3, "!=": 3, ">": 3, "<": 3, ">=": 3, "<=": 3,
             "+": 4, "-": 4, "*": 5, "/": 5, "%": 5, "atan2": 5, "^": 6}


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        k, v = self.next()
        if v != text:
            raise ValueError(f"expected {text!r}, got {v!r}")

    def parse(self):
        e = self.parse_binary(0)
        if self.peek()[0] != "EOF":
            raise ValueError(f"trailing input at {self.peek()[1]!r}")
        return e

    def parse_binary(self, min_prec: int):
        lhs = self.parse_unary()
        while True:
            k, v = self.peek()
            op = v if v in _BIN_PREC and (k == "OP" or k == "IDENT") else None
            if op is None or _BIN_PREC[op] < min_prec:
                return lhs
            self.next()
            bool_mode = False
            if op in _CMP_OPS and self.peek() == ("IDENT", "bool"):
                self.next()
                bool_mode = True
            match = None
            if self.peek()[1] in ("on", "ignoring"):
                kind = self.next()[1]
                self.expect("(")
                names = []
                if self.peek()[1] != ")":
                    while True:
                        ik, iv = self.next()
                        if ik == "STRING":
                            iv = _unquote(iv)  # 3.x quoted label name
                        elif ik != "IDENT":
                            raise ValueError(f"expected label, got {iv!r}")
                        names.append(iv)
                        if self.peek()[1] == ",":
                            self.next()
                            continue
                        break
                self.expect(")")
                match = (kind, tuple(names))
            group = None
            if self.peek()[1] in ("group_left", "group_right"):
                gkind = "left" if self.next()[1] == "group_left" else "right"
                if match is None:
                    raise ValueError(
                        "group_left/group_right requires an explicit "
                        "on/ignoring clause"
                    )
                if op in ("and", "or", "unless"):
                    raise ValueError(
                        f"group modifiers are not allowed with {op!r}"
                    )
                extras: list[str] = []
                if self.peek()[1] == "(":
                    self.next()
                    while self.peek()[1] != ")":
                        ik, iv = self.next()
                        if ik == "STRING":
                            iv = _unquote(iv)  # 3.x quoted label name
                        elif ik != "IDENT":
                            raise ValueError(f"expected label, got {iv!r}")
                        extras.append(iv)
                        if self.peek()[1] == ",":
                            self.next()
                    self.expect(")")
                if match[0] == "on":
                    clash = set(extras) & set(match[1])
                    if clash:
                        raise ValueError(
                            f"label {sorted(clash)[0]!r} must not occur in "
                            "both on() and the group clause"
                        )
                group = (gkind, tuple(extras))
            nxt = _BIN_PREC[op] + (0 if op == "^" else 1)
            rhs = self.parse_binary(nxt)
            lhs = BinOp(op, lhs, rhs, bool_mode, match, group)

    def parse_unary(self):
        k, v = self.peek()
        if k == "OP" and v in ("-", "+"):
            self.next()
            return Unary(v, self.parse_unary())
        return self.parse_postfix(self.parse_atom())

    def parse_postfix(self, e):
        while True:
            k, v = self.peek()
            if v == "[":
                self.next()
                dk, dv = self.next()
                if dk != "DURATION":
                    raise ValueError(f"expected duration, got {dv!r}")
                rng = parse_duration_ms(dv)
                if self.peek()[1] == ":":
                    self.next()
                    sk, sv = self.next()
                    if sk != "DURATION":
                        raise ValueError(f"expected step duration, got {sv!r}")
                    self.expect("]")
                    e = Subquery(e, rng, parse_duration_ms(sv))
                else:
                    self.expect("]")
                    if not isinstance(e, Selector) or e.range_ms is not None:
                        raise ValueError("range suffix only valid on a selector")
                    e = Selector(e.name, e.matchers, rng, e.offset_ms, e.at_ms)
            elif (k, v) == ("IDENT", "offset"):
                self.next()
                dk, dv = self.next()
                if dk != "DURATION":
                    raise ValueError(f"expected duration after offset, got {dv!r}")
                off = parse_duration_ms(dv)
                if isinstance(e, Selector):
                    e = Selector(e.name, e.matchers, e.range_ms,
                                 e.offset_ms + off, e.at_ms)
                elif isinstance(e, Subquery):
                    e = Subquery(e.expr, e.range_ms, e.step_ms,
                                 e.offset_ms + off, e.at_ms)
                else:
                    raise ValueError("offset only valid on a selector/subquery")
            elif (k, v) == ("OP", "@"):
                self.next()
                nk, nv = self.next()
                if nk == "IDENT" and nv in ("start", "end"):
                    # `@ start()` / `@ end()` — the range-query anchor
                    # functions; in an instant query both equal the
                    # evaluation time (Prometheus semantics)
                    self.expect("(")
                    self.expect(")")
                    at: int | str = nv
                elif nk != "NUMBER":
                    raise ValueError(
                        f"expected a unix-seconds timestamp or start()/end() "
                        f"after @, got {nv!r}"
                    )
                else:
                    at = int(round(float(nv) * 1000))
                if isinstance(e, Selector):
                    e = Selector(e.name, e.matchers, e.range_ms, e.offset_ms, at)
                elif isinstance(e, Subquery):
                    e = Subquery(e.expr, e.range_ms, e.step_ms, e.offset_ms, at)
                else:
                    raise ValueError("@ only valid on a selector/subquery")
            else:
                return e

    def parse_atom(self):
        k, v = self.next()
        if k == "NUMBER":
            return Number(float(v))
        if k == "STRING":
            return StringLit(_unquote(v))
        if v == "(":
            e = self.parse_binary(0)
            self.expect(")")
            return e
        if v == "{":
            bname, bms = self.parse_matchers_body()
            return Selector(bname, bms)
        if k == "IDENT":
            if v in ("by", "without", "offset", "bool"):
                raise ValueError(f"unexpected keyword {v!r}")
            if v in _AGG_OPS:
                return self.parse_agg(v)
            if v.lower() == "inf" and self.peek()[1] not in ("(", "{"):
                # Prometheus reserves Inf/NaN as number literals (any
                # case); a metric of that name needs the {} form
                return Number(float("inf"))
            if v.lower() == "nan" and self.peek()[1] not in ("(", "{"):
                return Number(float("nan"))
            nk, nv = self.peek()
            if nv == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.parse_binary(0))
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.parse_binary(0))
                self.expect(")")
                return Call(v, tuple(args))
            if nv == "{":
                self.next()
                bname, bms = self.parse_matchers_body()
                if bname is not None:
                    raise ValueError(
                        f"metric name specified twice: {v!r} and {bname!r}")
                return Selector(v, bms)
            # bare metric name
            return Selector(v, ())
        raise ValueError(f"unexpected token {v!r}")

    def parse_matchers_body(self) -> tuple[str | None, tuple[LabelMatcher, ...]]:
        """Brace body — Prometheus 3.x UTF-8 name syntax included:
        label names may be quoted strings ({"my.label"="x"}), and a
        BARE quoted string as the first item is the metric name
        ({"my metric", job="api"}). Returns (metric_name_or_None,
        matchers)."""
        ms: list[LabelMatcher] = []
        name_in_braces: str | None = None
        first = True
        if self.peek()[1] != "}":
            while True:
                nk, name = self.next()
                if nk == "STRING" and self.peek()[1] in (",", "}"):
                    # bare quoted string: the UTF-8 metric name
                    if not first:
                        raise ValueError(
                            "quoted metric name must be the first item "
                            "in the braces")
                    name_in_braces = _unquote(name)
                    first = False
                    if self.peek()[1] == ",":
                        self.next()
                        continue
                    break
                if nk == "STRING":
                    name = _unquote(name)  # quoted label name
                elif nk != "IDENT":
                    raise ValueError(f"expected label name, got {name!r}")
                first = False
                _, op = self.next()
                if op not in ("=", "!=", "=~", "!~"):
                    raise ValueError(f"bad matcher op {op!r}")
                sk, sv = self.next()
                if sk != "STRING":
                    raise ValueError(f"expected quoted value, got {sv!r}")
                mtype = {"=": "EQ", "!=": "NEQ", "=~": "RE", "!~": "NRE"}[op]
                ms.append(LabelMatcher(name, _unquote(sv), mtype))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
        self.expect("}")
        return name_in_braces, tuple(ms)

    def parse_agg(self, op: str):
        by = without = None
        param = None

        def clause():
            nonlocal by, without
            k, v = self.peek()
            if (k, v) == ("IDENT", "by") or (k, v) == ("IDENT", "without"):
                self.next()
                self.expect("(")
                names = []
                if self.peek()[1] != ")":
                    while True:
                        ik, iv = self.next()
                        if ik == "STRING":
                            iv = _unquote(iv)  # 3.x quoted label name
                        elif ik != "IDENT":
                            raise ValueError(f"expected label, got {iv!r}")
                        names.append(iv)
                        if self.peek()[1] == ",":
                            self.next()
                            continue
                        break
                self.expect(")")
                if v == "by":
                    by = tuple(names)
                else:
                    without = tuple(names)

        clause()
        self.expect("(")
        first = self.parse_binary(0)
        if op in ("topk", "bottomk", "quantile", "count_values",
                  "limitk", "limit_ratio"):
            self.expect(",")
            expr = self.parse_binary(0)
            param = first
        else:
            expr = first
        self.expect(")")
        clause()
        return Agg(op, expr, param, by, without)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "\\": "\\", '"': '"', "'": "'"}.get(
            m.group(1), m.group(1)
        ),
        body,
    )


def parse(text: str):
    """Parse a PromQL expression to its AST (raises ValueError)."""
    return _Parser(text).parse()


# -------------------------------------------------------------- formatter


_MATCH_OP = {"EQ": "=", "NEQ": "!=", "RE": "=~", "NRE": "!~"}


def format_duration_ms(ms: int) -> str:
    """Compact duration text that parse_duration_ms inverts exactly."""
    if ms <= 0:
        raise ValueError(f"cannot format non-positive duration {ms}ms")
    parts = []
    for unit, width in (("y", 31_536_000_000), ("w", 604_800_000),
                        ("d", 86_400_000), ("h", 3_600_000),
                        ("m", 60_000), ("s", 1000), ("ms", 1)):
        n, ms = divmod(ms, width)
        if n:
            parts.append(f"{n}{unit}")
    return "".join(parts)


def _quote(s: str) -> str:
    # Escape control whitespace too: the parser accepts raw newlines in
    # quoted strings, but canonical text should stay one line.
    return (
        '"'
        + s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\t", "\\t")
        + '"'
    )


def _fmt_modifiers(node) -> str:
    out = ""
    if isinstance(node.at_ms, str):
        out += f" @ {node.at_ms}()"
    elif node.at_ms is not None:
        out += f" @ {node.at_ms / 1000!r}"
    if node.offset_ms:
        out += f" offset {format_duration_ms(node.offset_ms)}"
    return out


# \Z, not $: re's $ also matches just before a trailing newline, so a
# name like "a\n" would wrongly count as a bare legacy identifier and
# be emitted unquoted (caught by the parse∘format fuzz property).
_METRIC_IDENT_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*\Z")
_LABEL_IDENT_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*\Z")


def _fmt_label_name(n: str) -> str:
    """Label name in canonical text: bare when it is a legacy
    identifier, quoted otherwise (the Prometheus 3.x UTF-8 rule)."""
    return n if _LABEL_IDENT_RE.match(n) else _quote(n)


def format_expr(node) -> str:
    """Canonical text for an AST — the /api/v1/format_query analog.
    The invariant the tests pin: parse(format_expr(parse(q))) ==
    parse(q) for every q the repo evaluates. Children of binary
    operators are parenthesized unconditionally — correctness over
    minimal output."""
    if isinstance(node, str):
        node = parse(node)
    if isinstance(node, Number):
        if node.value != node.value:  # NaN
            return "NaN"
        if node.value in (float("inf"), float("-inf")):
            return "Inf" if node.value > 0 else "-Inf"
        return f"{node.value!r}"
    if isinstance(node, StringLit):
        return _quote(node.value)
    if isinstance(node, Selector):
        ms = ", ".join(
            f"{_fmt_label_name(m.name)}{_MATCH_OP[m.type]}{_quote(m.value)}"
            for m in node.matchers
        )
        if node.name is not None and (
            not _METRIC_IDENT_RE.match(node.name)
            or node.name.lower() in ("inf", "nan")  # number literals
        ):
            # Prometheus 3.x UTF-8 metric name: quoted, first in braces
            body = "{" + _quote(node.name) + (f", {ms}" if ms else "") + "}"
        else:
            body = (node.name or "") + (
                f"{{{ms}}}" if ms or not node.name else "")
        rng = f"[{format_duration_ms(node.range_ms)}]" if node.range_ms else ""
        return body + rng + _fmt_modifiers(node)
    if isinstance(node, Subquery):
        return (
            f"{format_expr(node.expr)}"
            f"[{format_duration_ms(node.range_ms)}:"
            f"{format_duration_ms(node.step_ms)}]" + _fmt_modifiers(node)
        )
    if isinstance(node, Call):
        return f"{node.func}({', '.join(format_expr(a) for a in node.args)})"
    if isinstance(node, Agg):
        clause = ""
        if node.by is not None:
            clause = f" by ({', '.join(map(_fmt_label_name, node.by))})"
        elif node.without is not None:
            clause = (
                f" without ({', '.join(map(_fmt_label_name, node.without))})"
            )
        args = ([format_expr(node.param) + ", "] if node.param is not None
                else [""])[0]
        return f"{node.op}{clause} ({args}{format_expr(node.expr)})"
    if isinstance(node, BinOp):
        op = node.op + (" bool" if node.bool_mode else "")
        if node.match is not None:
            op += (
                f" {node.match[0]} "
                f"({', '.join(map(_fmt_label_name, node.match[1]))})"
            )
        if node.group is not None:
            # always emit the label list (empty ok) — a bare modifier
            # followed by the parenthesized rhs would re-parse the rhs
            # parens as the list
            op += (
                f" group_{node.group[0]} "
                f"({', '.join(map(_fmt_label_name, node.group[1]))})"
            )
        return f"({format_expr(node.lhs)}) {op} ({format_expr(node.rhs)})"
    if isinstance(node, Unary):
        return f"{node.op}({format_expr(node.expr)})"
    raise ValueError(f"cannot format {node!r}")


def ast_to_dict(node) -> dict:
    """The parsed AST as plain JSON-able dicts, each node tagged with
    its kind — the /api/v1/parse_query payload (the Prometheus 3.x
    experimental endpoint, serving THIS engine's AST dialect: field
    names match the dataclasses above; Prometheus's internal AST JSON
    is not a stable public schema to clone, so tooling should key on
    this documented shape, which format_expr round-trips)."""
    if isinstance(node, str):
        node = parse(node)
    if isinstance(node, Number):
        return {"kind": "number", "value": node.value}
    if isinstance(node, StringLit):
        return {"kind": "string", "value": node.value}
    if isinstance(node, Selector):
        return {
            "kind": "selector",
            "name": node.name,
            "matchers": [
                {"name": m.name, "op": _MATCH_OP[m.type], "value": m.value}
                for m in node.matchers
            ],
            "range_ms": node.range_ms,
            "offset_ms": node.offset_ms,
            "at": node.at_ms,
        }
    if isinstance(node, Subquery):
        return {
            "kind": "subquery",
            "expr": ast_to_dict(node.expr),
            "range_ms": node.range_ms,
            "step_ms": node.step_ms,
            "offset_ms": node.offset_ms,
            "at": node.at_ms,
        }
    if isinstance(node, Call):
        return {
            "kind": "call",
            "func": node.func,
            "args": [ast_to_dict(a) for a in node.args],
        }
    if isinstance(node, Agg):
        return {
            "kind": "aggregation",
            "op": node.op,
            "expr": ast_to_dict(node.expr),
            "param": None if node.param is None else ast_to_dict(node.param),
            "by": list(node.by) if node.by is not None else None,
            "without": (
                list(node.without) if node.without is not None else None
            ),
        }
    if isinstance(node, BinOp):
        return {
            "kind": "binary",
            "op": node.op,
            "bool": node.bool_mode,
            "match": (
                None
                if node.match is None
                else {"on": node.match[0] == "on",
                      "labels": list(node.match[1])}
            ),
            "group": (
                None
                if node.group is None
                else {"side": node.group[0], "labels": list(node.group[1])}
            ),
            "lhs": ast_to_dict(node.lhs),
            "rhs": ast_to_dict(node.rhs),
        }
    if isinstance(node, Unary):
        return {"kind": "unary", "op": node.op,
                "expr": ast_to_dict(node.expr)}
    raise ValueError(f"cannot serialize {node!r}")


# --------------------------------------------------------------- evaluator


@dataclass
class _Ctx:
    samples: DataFrame  # [labels map, timestamp long ms, value double]
    eval_ms: int
    lookback_ms: int


def time_window(expr, eval_ms: int, lookback_ms: int = DEFAULT_LOOKBACK_MS) -> tuple[int, int]:
    """The inclusive [lo, hi] sample window an instant evaluation of
    ``expr`` at ``eval_ms`` can touch — the union of every selector's
    absolute span (selector lookback for instant selectors, range for
    range selectors, the tile interval for subqueries, `@` anchors
    taken absolutely, offsets tightening both ends). Lets a serving
    layer scan ONLY the needed chunk partitions before handing the
    pruned DataFrame to eval_instant. With a future `@` anchor, hi can
    exceed eval_ms."""
    if isinstance(expr, str):
        expr = parse(expr)
    spans: list[tuple[int, int]] = []

    def walk(node, off_lo: int, off_hi: int, anchor: int) -> None:
        # [off_lo, off_hi] is the interval of reach-backs the enclosing
        # subqueries evaluate this subtree at (a subquery's inner
        # expression runs once per tile, from `offset` to
        # `offset+range` before the anchor); a node's own `@` resets
        # the anchor — and the accumulated reach — absolutely.
        if isinstance(node, Selector):
            if node.at_ms is not None:
                at = eval_ms if isinstance(node.at_ms, str) else node.at_ms
                anchor, off_lo, off_hi = at, 0, 0
            hi = anchor - off_lo - node.offset_ms
            lo = anchor - off_hi - node.offset_ms - (node.range_ms or lookback_ms)
            spans.append((lo, hi))
        elif isinstance(node, Subquery):
            if node.at_ms is not None:
                at = eval_ms if isinstance(node.at_ms, str) else node.at_ms
                walk(node.expr, node.offset_ms,
                     node.offset_ms + node.range_ms, at)
            else:
                walk(node.expr, off_lo + node.offset_ms,
                     off_hi + node.offset_ms + node.range_ms, anchor)
        elif isinstance(node, Call):
            for a in node.args:
                walk(a, off_lo, off_hi, anchor)
        elif isinstance(node, Agg):
            walk(node.expr, off_lo, off_hi, anchor)
            if node.param is not None:
                walk(node.param, off_lo, off_hi, anchor)
        elif isinstance(node, BinOp):
            walk(node.lhs, off_lo, off_hi, anchor)
            walk(node.rhs, off_lo, off_hi, anchor)
        elif isinstance(node, Unary):
            walk(node.expr, off_lo, off_hi, anchor)

    walk(expr, 0, 0, eval_ms)
    if not spans:  # selector-free expression touches no samples
        return eval_ms, eval_ms
    return min(lo for lo, _ in spans), max(hi for _, hi in spans)


def eval_instant(
    samples: DataFrame,
    expr,
    eval_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """Evaluate ``expr`` (AST or text) as an instant query at
    ``eval_ms`` over a [labels, timestamp, value] DataFrame. Returns
    [signature, labels, value] — one row per output series."""
    if isinstance(expr, str):
        expr = parse(expr)
    ctx = _Ctx(samples, eval_ms, lookback_ms)
    kind, v = _eval(expr, ctx)
    if kind == "scalar":
        spark = samples.sparkSession
        return spark.range(1).select(
            F.lit("").alias("signature"),
            F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            ).alias("labels"),
            F.lit(float(v)).cast("double").alias("value"),
        )
    return v


def _eval(node, ctx: _Ctx):
    if isinstance(node, Number):
        return ("scalar", node.value)
    if isinstance(node, StringLit):
        raise ValueError("string literal outside a function argument")
    if isinstance(node, Unary):
        kind, v = _eval(node.expr, ctx)
        if node.op == "+":
            return (kind, v)
        if kind == "scalar":
            return ("scalar", -v)
        return ("vector", v.withColumn("value", -F.col("value")))
    if isinstance(node, Selector):
        if node.range_ms is not None:
            raise ValueError("range vector where an instant value is expected")
        return ("vector", _instant_selector(node, ctx))
    if isinstance(node, Subquery):
        raise ValueError("subquery only supported inside *_over_time functions")
    if isinstance(node, Call):
        return _eval_call(node, ctx)
    if isinstance(node, Agg):
        return _eval_agg(node, ctx)
    if isinstance(node, BinOp):
        return _eval_binop(node, ctx)
    raise ValueError(f"cannot evaluate {node!r}")


# -- selectors ----------------------------------------------------------


def _base(node: Selector, ctx: _Ctx, time_pred=None) -> DataFrame:
    """Matcher (+ optional time) filter and the signature projection in
    at most TWO DataFrame hops — every hop costs a full eager
    re-analysis of the lineage on the driver, which at sub-second
    query sizes is a measurable slice of the wall time (§7.3)."""
    df = ctx.samples
    ms = list(node.matchers)
    if node.name is not None:
        ms = [LabelMatcher("__name__", node.name, "EQ"), *ms]
    pred = matcher_predicate("labels", ms) if ms else None
    if time_pred is not None:
        pred = time_pred if pred is None else (pred & time_pred)
    if pred is not None:
        df = df.filter(pred)
    if "signature" not in df.columns:
        df = df.select(
            signature_expr("labels").alias("signature"),
            "labels", "timestamp", "value",
        )
    elif df.columns != ["signature", "labels", "timestamp", "value"]:
        df = df.select("signature", "labels", "timestamp", "value")
    return df


def _anchor_ms(node, ctx: _Ctx) -> int:
    """The effective evaluation anchor for a selector/subquery: its
    `@` timestamp when present, else the query's eval time. `offset`
    shifts relative to the anchor (Prometheus semantics). The
    `start()`/`end()` anchor functions both equal the evaluation time
    in an instant query (the only mode that reaches here — eval_range
    rejects @ on tiles)."""
    if isinstance(node.at_ms, str):
        return ctx.eval_ms
    return node.at_ms if node.at_ms is not None else ctx.eval_ms


def _range_df(node: Selector, ctx: _Ctx) -> tuple[DataFrame, int, int]:
    end = _anchor_ms(node, ctx) - node.offset_ms
    start = end - (node.range_ms or 0)
    df = _base(
        node, ctx,
        (F.col("timestamp") >= start) & (F.col("timestamp") <= end),
    )
    return df, start, end


def _instant_selector(node: Selector, ctx: _Ctx) -> DataFrame:
    end = _anchor_ms(node, ctx) - node.offset_ms
    start = end - ctx.lookback_ms
    df = _base(
        node, ctx,
        (F.col("timestamp") >= start) & (F.col("timestamp") <= end),
    )
    # struct-max gives the (ts desc, value desc) deterministic pick with
    # map-side partials; labels ride separately (maps aren't orderable)
    return (
        df.groupBy("signature")
        .agg(
            F.max(F.struct("timestamp", "value")).alias("__top"),
            F.first("labels").alias("labels"),
        )
        .select("signature", "labels", F.col("__top.value").alias("value"))
    )


def _attach_labels(out: DataFrame, src: DataFrame, value_col: str) -> DataFrame:
    """Re-attach the labels map to a builder result keyed by signature
    (builders group by signature only — maps aren't groupable). The
    per-series dim is one row per matched series → broadcast join."""
    dim = src.select("signature", "labels").dropDuplicates(["signature"])
    return out.join(F.broadcast(dim), "signature").select(
        "signature", "labels", F.col(value_col).cast("double").alias("value")
    )


# -- range-function machinery --------------------------------------------


def _steps(df: DataFrame) -> DataFrame:
    """Reset-corrected consecutive increases per series (the shared
    core of rate/increase — ts_rate's exact construction)."""
    w = Window.partitionBy("signature").orderBy("timestamp", "value")
    dec = F.col("value").cast(_DEC)
    prev = F.lag(dec).over(w)
    step = (
        F.when(prev.isNull(), F.lit(None))
        .when(dec >= prev, dec - prev)
        .otherwise(dec)
    )
    return df.select(
        "signature", "labels", F.col("timestamp").alias("ts_ms"), step.alias("step")
    ).filter(F.col("step").isNotNull())


def _hashable_group(df: DataFrame, keys: list, label_src: str, *aggs) -> DataFrame:
    """groupBy(*keys, map_entries(label_src)).agg(*aggs) with the label
    map rebuilt post-agg as ``labels`` — the HashAggregate-eligible form
    of groupBy(keys).agg(first(label_src), ...). A map-typed FIRST agg
    buffer refuses hash aggregation (Spark 4.1 plans a SortAggregate at
    the INPUT grain, paying a per-partition sort of every sample), but
    the map's ENTRIES array is a valid var-width grouping key, and
    map_from_entries(map_entries(m)) round-trips the map byte-for-byte,
    entry order included. Sound only because every key set used here
    functionally determines the label map (signature ↔ labels is
    injective), so the added key never changes the group grain. Only
    call this when every agg buffer is hashable (fixed-width or
    typed-imperative like collect_list); for struct-max buffers the agg
    sort-aggregates regardless and the wider sort key would only slow
    the tie-break comparisons — keep first(labels) there."""
    g = df.groupBy(*keys, F.map_entries(label_src).alias("__lent"))
    return (
        g.agg(*aggs)
        .withColumn("labels", F.map_from_entries("__lent"))
        .drop("__lent")
    )


# over_time ops whose agg buffer is a struct (max/min of struct) — those
# sort-aggregate no matter how labels travel, so they keep first(labels)
_STRUCT_BUFFER_OPS = frozenset(("last", "ts_of_max", "ts_of_min"))


def _per_series(
    df: DataFrame,
    *aggs,
    extra_keys: tuple[str, ...] = (),
    hash_friendly: bool = True,
) -> DataFrame:
    if not hash_friendly:
        return df.groupBy("signature", *extra_keys).agg(
            F.first("labels").alias("labels"), *aggs
        )
    return _hashable_group(df, ["signature", *extra_keys], "labels", *aggs)


def _rate(df, start, end, per_second=True):
    agg = _per_series(
        _steps(df),
        F.sum("step").cast("double").alias("__s"),
        F.min("ts_ms").alias("__mn"),
        F.max("ts_ms").alias("__mx"),
    )
    if per_second:
        agg = agg.filter(F.col("__mx") > F.col("__mn"))
        val = F.col("__s") / (F.col("__mx") - F.col("__mn")) * F.lit(1000.0)
    else:
        val = F.col("__s")
    return agg.select("signature", "labels", val.alias("value"))


def _delta(df):
    agg = _per_series(
        df,
        F.max(F.struct("timestamp", "value")).alias("__last"),
        F.min(F.struct("timestamp", "value")).alias("__first"),
        F.count("*").alias("__n"),
        hash_friendly=False,  # struct buffers sort-aggregate regardless
    ).filter(F.col("__n") >= 2)
    return agg.select(
        "signature",
        "labels",
        (F.col("__last.value") - F.col("__first.value")).alias("value"),
    )


def _idelta(df):
    w = Window.partitionBy("signature").orderBy(
        F.col("timestamp").desc(), F.col("value").desc()
    )
    ranked = df.select(
        "signature", "labels", "value", F.row_number().over(w).alias("__rn")
    ).filter(F.col("__rn") <= 2)
    agg = _hashable_group(
        ranked,
        ["signature"],
        "labels",
        F.max(F.when(F.col("__rn") == 1, F.col("value"))).alias("__v1"),
        F.max(F.when(F.col("__rn") == 2, F.col("value"))).alias("__v2"),
    ).filter(F.col("__v2").isNotNull())
    return agg.select(
        "signature", "labels", (F.col("__v1") - F.col("__v2")).alias("value")
    )


def _array_quantile(arr, phi):
    """PromQL-interpolated quantile over a SORTED array column."""
    n = F.size(arr)
    rank = phi * (n - F.lit(1)).cast("double")
    lo = F.floor(rank).cast("int")
    frac = rank - lo.cast("double")
    v_lo = F.element_at(arr, lo + 1)
    v_hi = F.element_at(arr, F.least(lo + 2, n))
    return v_lo + (v_hi - v_lo) * frac


def _over_time(df, op: str, param: float | None = None,
               extra_keys: tuple[str, ...] = ()):
    if op == "avg":
        a = [F.sum(F.col("value").cast(_DEC)).cast("double").alias("__s"),
             F.count("*").alias("__n")]
        val = F.col("__s") / F.col("__n")
    elif op == "sum":
        a = [F.sum(F.col("value").cast(_DEC)).cast("double").alias("__s")]
        val = F.col("__s")
    elif op == "min":
        a = [F.min("value").alias("__s")]
        val = F.col("__s")
    elif op == "max":
        a = [F.max("value").alias("__s")]
        val = F.col("__s")
    elif op == "count":
        a = [F.count("*").alias("__s")]
        val = F.col("__s").cast("double")
    elif op == "last":
        a = [F.max(F.struct("timestamp", "value")).alias("__t")]
        val = F.col("__t.value")
    elif op in ("ts_of_max", "ts_of_min", "ts_of_last"):
        # Prometheus 3.5 experimental: the sample's own TIMESTAMP in
        # seconds. Ties pick deterministically via the struct order:
        # ts_of_max the LATEST max, ts_of_min the EARLIEST min.
        if op == "ts_of_max":
            a = [F.max(F.struct("value", "timestamp")).alias("__t")]
            val = F.col("__t.timestamp") / F.lit(1000.0)
        elif op == "ts_of_min":
            a = [F.min(F.struct("value", "timestamp")).alias("__t")]
            val = F.col("__t.timestamp") / F.lit(1000.0)
        else:
            a = [F.max("timestamp").alias("__t")]
            val = F.col("__t") / F.lit(1000.0)
    elif op == "present":
        a = [F.count("*").alias("__n")]
        val = F.lit(1.0)
    elif op in ("stddev", "stdvar"):
        # population moments from exact DECIMAL accumulators (ts_stddev)
        y = F.col("value").cast("decimal(18,2)")
        a = [F.count("*").alias("__n"),
             F.sum(y).cast("double").alias("__sy"),
             F.sum(y * y).cast("double").alias("__syy")]
        var = F.greatest(
            (F.col("__syy") - F.col("__sy") * F.col("__sy") / F.col("__n"))
            / F.col("__n"),
            F.lit(0.0),
        )
        val = F.sqrt(var) if op == "stddev" else var
    elif op == "quantile":
        a = [F.sort_array(F.collect_list("value")).alias("__a")]
        val = _array_quantile(F.col("__a"), F.lit(float(param)))
    elif op == "mad":
        # mad_over_time (Prometheus experimental-promql-functions):
        # median(|v - median(v)|), both medians the PromQL-interpolated
        # q0.5. One collect per group, then pure array expressions —
        # same bounded-window shape as quantile_over_time.
        a = [F.sort_array(F.collect_list("value")).alias("__a")]
        med = _array_quantile(F.col("__a"), F.lit(0.5))
        devs = F.sort_array(
            F.transform(F.col("__a"), lambda x: F.abs(x - med))
        )
        val = _array_quantile(devs, F.lit(0.5))
    else:  # pragma: no cover
        raise ValueError(f"unknown over_time op {op!r}")
    agg = _per_series(
        df, *a, extra_keys=extra_keys,
        hash_friendly=op not in _STRUCT_BUFFER_OPS,
    )
    return agg.select(
        "signature", "labels", *extra_keys, val.cast("double").alias("value")
    )


_RANGE_FUNCS = {
    "rate", "increase", "delta", "idelta", "irate", "resets", "changes",
    "deriv", "predict_linear", "holt_winters",
    "double_exponential_smoothing",  # the Prometheus 3.x name for holt_winters
    "avg_over_time", "sum_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time", "stddev_over_time",
    "stdvar_over_time", "present_over_time", "quantile_over_time",
    "mad_over_time",
    # Prometheus 3.5 experimental: the TIMESTAMP of the extreme/last
    # sample in the range (seconds)
    "ts_of_max_over_time", "ts_of_min_over_time", "ts_of_last_over_time",
}

_MATH_FUNCS = {
    "abs": F.abs, "ceil": F.ceil, "floor": F.floor, "exp": F.exp,
    "ln": F.log, "log2": F.log2, "log10": F.log10, "sqrt": F.sqrt,
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "deg": F.degrees, "rad": F.radians,
}

# date components of a sample VALUE interpreted as unix seconds
# (Prometheus semantics; zero-arg forms evaluate at the query time).
# Session TZ is UTC (get_spark pins it), matching Prometheus's UTC-only
# calendar math.
def _date_exprs():
    t = F.from_unixtime(F.col("value")).cast("timestamp")
    return {
        "minute": F.minute(t),
        "hour": F.hour(t),
        "day_of_week": F.dayofweek(t) - F.lit(1),  # 0 = Sunday
        "day_of_month": F.dayofmonth(t),
        "days_in_month": F.dayofmonth(F.last_day(t)),
        "month": F.month(t),
        "year": F.year(t),
    }


_DATE_FUNCS = frozenset(
    ("minute", "hour", "day_of_week", "day_of_month", "days_in_month",
     "month", "year")
)


def _scalar_arg(node, ctx, func: str) -> float:
    kind, v = _eval(node, ctx)
    if kind != "scalar":
        raise ValueError(f"{func}() expects a scalar argument")
    return float(v)


def _eval_call(node: Call, ctx: _Ctx):
    f = node.func
    if f in _RANGE_FUNCS:
        return ("vector", _eval_range_func(node, ctx))
    if f == "pi":
        import math

        return ("scalar", math.pi)
    if f in ("sort", "sort_desc"):
        # DataFrames are unordered sets; Prometheus defines sort() only
        # for instant-API presentation. Vector identity here — a
        # serving layer orders the collected rows.
        kind, v = _eval(node.args[0], ctx)
        if kind != "vector":
            raise ValueError(f"{f}() expects an instant vector")
        return ("vector", v)
    if f in ("sort_by_label", "sort_by_label_desc"):
        # Prometheus 3.x experimental: order by the named labels'
        # values. Ordering is API presentation only (the serving layer
        # reads the label list off the AST); the vector is unchanged.
        if len(node.args) < 2:
            raise ValueError(f"{f}() expects a vector and >=1 label name")
        for a in node.args[1:]:
            if not isinstance(a, StringLit):
                raise ValueError(f"{f}() label names must be strings")
        kind, v = _eval(node.args[0], ctx)
        if kind != "vector":
            raise ValueError(f"{f}() expects an instant vector")
        return ("vector", v)
    if f in _MATH_FUNCS:
        (kind, v) = _eval(node.args[0], ctx)
        if kind == "scalar":
            import math

            py = {"abs": abs, "ceil": math.ceil, "floor": math.floor,
                  "exp": math.exp, "ln": math.log, "log2": math.log2,
                  "log10": math.log10, "sqrt": math.sqrt,
                  "sin": math.sin, "cos": math.cos, "tan": math.tan,
                  "asin": math.asin, "acos": math.acos, "atan": math.atan,
                  "sinh": math.sinh, "cosh": math.cosh, "tanh": math.tanh,
                  "deg": math.degrees, "rad": math.radians}[f]
            return ("scalar", float(py(v)))
        fn = _MATH_FUNCS[f]
        return ("vector", v.withColumn("value", fn(F.col("value")).cast("double")))
    if f in _DATE_FUNCS:
        if not node.args:  # zero-arg form: the query evaluation time
            import datetime as _dt

            t = _dt.datetime.fromtimestamp(
                ctx.eval_ms / 1000.0, tz=_dt.timezone.utc
            )
            vals = {
                "minute": t.minute, "hour": t.hour,
                "day_of_week": (t.weekday() + 1) % 7,  # 0 = Sunday
                "day_of_month": t.day,
                "days_in_month": (
                    (t.replace(day=28) + _dt.timedelta(days=4)).replace(day=1)
                    - _dt.timedelta(days=1)
                ).day,
                "month": t.month, "year": t.year,
            }
            return ("scalar", float(vals[f]))
        (kind, v) = _eval(node.args[0], ctx)
        if kind != "vector":
            raise ValueError(f"{f}() expects an instant vector")
        expr = _date_exprs()[f]
        return ("vector", v.withColumn("value", expr.cast("double")))
    if f == "timestamp":
        # the sample timestamp of each series' point; instant selectors
        # evaluate to their latest point, whose ts the struct-max keeps
        arg = node.args[0] if node.args else None
        if not (isinstance(arg, Selector) and arg.range_ms is None):
            raise ValueError("timestamp() expects an instant selector")
        end = _anchor_ms(arg, ctx) - arg.offset_ms
        start = end - ctx.lookback_ms
        df = _base(
            arg, ctx,
            (F.col("timestamp") >= start) & (F.col("timestamp") <= end),
        )
        out = (
            df.groupBy("signature")
            .agg(
                F.max(F.struct("timestamp", "value")).alias("__top"),
                F.first("labels").alias("labels"),
            )
            .select(
                "signature", "labels",
                (F.col("__top.timestamp") / F.lit(1000.0))
                .cast("double").alias("value"),
            )
        )
        return ("vector", out)
    if f == "round":
        (kind, v) = _eval(node.args[0], ctx)
        to = _scalar_arg(node.args[1], ctx, f) if len(node.args) > 1 else 1.0
        # Prometheus: nearest multiple of `to`, ties round UP
        expr = F.floor(F.col("value") / F.lit(to) + F.lit(0.5)) * F.lit(to)
        return ("vector", v.withColumn("value", expr.cast("double")))
    if f in ("clamp", "clamp_min", "clamp_max"):
        (kind, v) = _eval(node.args[0], ctx)
        if f == "clamp":
            lo = _scalar_arg(node.args[1], ctx, f)
            hi = _scalar_arg(node.args[2], ctx, f)
            expr = F.least(F.greatest(F.col("value"), F.lit(lo)), F.lit(hi))
        elif f == "clamp_min":
            expr = F.greatest(F.col("value"), F.lit(_scalar_arg(node.args[1], ctx, f)))
        else:
            expr = F.least(F.col("value"), F.lit(_scalar_arg(node.args[1], ctx, f)))
        return ("vector", v.withColumn("value", expr.cast("double")))
    if f == "absent_over_time":
        arg = node.args[0] if node.args else None
        if not (isinstance(arg, Selector) and arg.range_ms is not None):
            raise ValueError("absent_over_time() takes a range selector")
        df, _, _ = _range_df(arg, ctx)
        marker = (
            df.groupBy()
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") == 0)
            .select(
                F.lit("").alias("signature"),
                F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast("array<string>"),
                ).alias("labels"),
                F.lit(1.0).alias("value"),
            )
        )
        return ("vector", marker)
    if f == "absent":
        kind, v = _eval(node.args[0], ctx)
        marker = (
            v.groupBy()
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") == 0)
            .select(
                F.lit("").alias("signature"),
                F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast("array<string>"),
                ).alias("labels"),
                F.lit(1.0).alias("value"),
            )
        )
        return ("vector", marker)
    if f == "sgn":
        kind, v = _eval(node.args[0], ctx)
        if kind == "scalar":
            return ("scalar", float((v > 0) - (v < 0)))
        return (
            "vector",
            v.withColumn("value", F.signum(F.col("value")).cast("double")),
        )
    if f == "time":
        return ("scalar", ctx.eval_ms / 1000.0)
    if f == "vector":
        s = _scalar_arg(node.args[0], ctx, f)
        spark = ctx.samples.sparkSession
        return (
            "vector",
            spark.range(1).select(
                F.lit("").alias("signature"),
                F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast("array<string>"),
                ).alias("labels"),
                F.lit(float(s)).cast("double").alias("value"),
            ),
        )
    if f == "scalar":
        # Prometheus scalar(): the single series' value, NaN otherwise.
        # The operand is a series-grain vector, so the driver-side
        # resolve is a bounded 1-row collect (documented cost).
        kind, v = _eval(node.args[0], ctx)
        if kind == "scalar":
            return ("scalar", float(v))
        rows = v.select("value").limit(2).collect()
        return ("scalar", float(rows[0]["value"]) if len(rows) == 1
                else float("nan"))
    if f == "label_replace":
        return ("vector", _label_replace(node, ctx))
    if f == "label_join":
        return ("vector", _label_join(node, ctx))
    if f == "info":
        # Prometheus 3.x experimental info(): enrich every series with
        # the DATA labels of the info metric (default target_info —
        # exactly what the OTLP receiver writes for leftover resource
        # attributes) sharing its identifying labels (job, instance).
        # A second instant selector narrows the info series (and may
        # name a different info metric). Series without a match pass
        # through unchanged; more than one matching info series per
        # identity raises at execution (the many-to-one guard); the
        # series' own labels win on collision. One series-grain join —
        # the info side is a latest-per-series instant selection.
        import dataclasses

        kind, v = _eval(node.args[0], ctx)
        if kind != "vector":
            raise ValueError("info() expects an instant vector")
        if len(node.args) > 1:
            isel = node.args[1]
            if not isinstance(isel, Selector) or isel.range_ms is not None:
                raise ValueError(
                    "info() second argument must be an instant selector")
            if isel.name is None and not any(
                m.name == "__name__" for m in isel.matchers
            ):
                isel = dataclasses.replace(isel, name="target_info")
        else:
            isel = Selector("target_info", ())
        return ("vector", _info_enrich(v, isel, ctx))
    if f == "histogram_quantile":
        phi = _scalar_arg(node.args[0], ctx, f)
        kind, v = _eval(node.args[1], ctx)
        return ("vector", _histogram_quantile(phi, v))
    if f == "histogram_fraction":
        lo = _scalar_arg(node.args[0], ctx, f)
        hi = _scalar_arg(node.args[1], ctx, f)
        kind, v = _eval(node.args[2], ctx)
        return ("vector", _histogram_fraction(lo, hi, v))
    raise ValueError(f"unsupported PromQL function {f!r}")


def _eval_range_func(node: Call, ctx: _Ctx) -> DataFrame:
    f = node.func
    if f == "quantile_over_time":
        # PromQL argument order: quantile_over_time(φ, m[range])
        phi = _scalar_arg(node.args[0], ctx, f)
        sel = node.args[1]
        if isinstance(sel, Subquery):
            return _eval_subquery_func(f, sel, node, ctx, param=phi)
        if not isinstance(sel, Selector) or sel.range_ms is None:
            raise ValueError("quantile_over_time expects (φ, m[range])")
        df, _, _ = _range_df(sel, ctx)
        return _over_time(df, "quantile", phi)
    sel_arg = node.args[0]
    if isinstance(sel_arg, Subquery):
        return _eval_subquery_func(f, sel_arg, node, ctx)
    if not isinstance(sel_arg, Selector) or sel_arg.range_ms is None:
        raise ValueError(f"{f}() expects a range selector, e.g. m[5m]")
    df, start, end = _range_df(sel_arg, ctx)
    if f == "rate":
        return _rate(df, start, end, per_second=True)
    if f == "increase":
        return _rate(df, start, end, per_second=False)
    if f == "delta":
        return _delta(df)
    if f == "idelta":
        return _idelta(df)
    if f == "irate":
        out = _tsops.irate(df, key_cols=["signature"], out="__v")
        return _attach_labels(out, df, "__v")
    if f in ("resets", "changes"):
        out = _tsops.changes_resets(df, key_cols=["signature"])
        col = "n_resets" if f == "resets" else "n_changes"
        return _attach_labels(out, df, col)
    if f == "deriv":
        out = _tsops.linreg_slope(df, key_cols=["signature"], t0=start, out="__v")
        return _attach_labels(out, df, "__v")
    if f == "predict_linear":
        t_sec = _scalar_arg(node.args[1], ctx, f)
        at_ms = (end - start) + int(t_sec * 1000)  # relative to t0=start
        out = _tsops.predict_linear(
            df, key_cols=["signature"], t0=start, at_ms=at_ms, out="__v"
        )
        return _attach_labels(out, df, "__v")
    if f in ("holt_winters", "double_exponential_smoothing"):
        sf = _scalar_arg(node.args[1], ctx, f)
        tf = _scalar_arg(node.args[2], ctx, f)
        out = _tsops.holt_winters(
            df, key_cols=["signature"], sf=sf, tf=tf, out="__v"
        )
        return _attach_labels(out, df, "__v")
    if f.endswith("_over_time"):
        return _over_time(df, f[: -len("_over_time")])
    raise ValueError(f"unsupported range function {f!r}")


def _eval_subquery_func(
    f: str, sq: Subquery, node: Call, ctx: _Ctx, param: float | None = None
) -> DataFrame:
    """``<agg>_over_time(inner[R:step])`` where inner is rate/increase/
    delta of a range selector. The outer range is tiled by step-width
    windows anchored at (eval - offset - R); the inner function runs
    isolated per window — a lag partitioned on (series, window) — so
    counter state never leaks across evaluations
    (ts_subquery_max_rate's pinned semantics). The inner range may be
    any whole multiple k = inner_range/step up to RANGE_TILE_MAX_K
    (samples fan into the ≤k windows whose range covers their tile —
    bounded explode, one scan); with inner == step (the common
    dashboard shape) the duplication is exactly 1 — one sort shuffle."""
    if not (f.endswith("_over_time") and f[: -len("_over_time")] in
            ("avg", "sum", "min", "max", "count", "last", "present",
             "stddev", "stdvar", "mad", "quantile")):
        raise ValueError(f"subquery argument not supported for {f}()")
    op = f[: -len("_over_time")]
    inner = sq.expr
    if not (
        isinstance(inner, Call)
        and inner.func in ("rate", "increase", "delta")
        and len(inner.args) == 1
        and isinstance(inner.args[0], Selector)
        and inner.args[0].range_ms is not None
    ):
        raise ValueError(
            "subquery inner must be rate/increase/delta of a range selector"
        )
    sel = inner.args[0]
    # inner range = k*subquery-step (k a whole multiple, capped): each
    # sample fans into the ≤k consecutive windows whose inner range
    # covers its tile — the same bounded-explode device eval_range's
    # tiles() uses, so `avg_over_time(rate(m[5m])[1h:1m])` works
    k = _tile_k(sel.range_ms, sq.step_ms)
    if sel.at_ms is not None:
        raise ValueError(
            "@ on the inner selector of a subquery is not supported — "
            "every tile would evaluate the same fixed window"
        )
    end = _anchor_ms(sq, ctx) - sq.offset_ms - sel.offset_ms
    start = end - sq.range_ms
    df = _base(
        sel, ctx,
        (F.col("timestamp") >= start - (k - 1) * sq.step_ms)
        & (F.col("timestamp") <= end),
    )
    win = F.floor((F.col("timestamp") - F.lit(start)) / F.lit(sq.step_ms))
    # a point at exactly ts == end would index one past the tiling
    # (floor(R/step)) — clamp it out rather than opening a spurious
    # single-instant window
    n_tiles = -(-sq.range_ms // sq.step_ms)
    if k == 1:
        pts = df.select(
            "signature", "labels", win.alias("__w"), "timestamp", "value"
        ).filter(F.col("__w") < n_tiles)
    else:
        base_pts = df.select(
            "signature", "labels", win.alias("__w0"), "timestamp", "value"
        ).filter(
            (F.col("__w0") < n_tiles) & (F.col("__w0") + (k - 1) >= 0)
        )
        wins = F.sequence(
            F.greatest(F.col("__w0").cast("long"), F.lit(0).cast("long")),
            F.least(
                F.col("__w0").cast("long") + F.lit(int(k - 1)).cast("long"),
                F.lit(int(n_tiles - 1)).cast("long"),
            ),
        )
        pts = base_pts.select(
            "signature", "labels", F.explode(wins).alias("__w"),
            "timestamp", "value",
        )
    w = Window.partitionBy("signature", "__w").orderBy("timestamp", "value")
    dec = F.col("value").cast(_DEC)
    prev = F.lag(dec).over(w)
    if inner.func == "delta":
        step = F.when(prev.isNull(), F.lit(None)).otherwise(dec - prev)
    else:
        step = (
            F.when(prev.isNull(), F.lit(None))
            .when(dec >= prev, dec - prev)
            .otherwise(dec)
        )
    stepped = pts.select(
        "signature", "labels", "__w", step.alias("__step")
    ).filter(F.col("__step").isNotNull())
    per_win = _hashable_group(
        stepped,
        ["signature", "__w"],
        "labels",
        F.sum("__step").cast("double").alias("__v"),
    )
    if inner.func == "rate":
        per_win = per_win.withColumn(
            "__v", F.col("__v") / F.lit(sel.range_ms / 1000.0)
        )
    inner_vals = per_win.select(
        "signature", "labels", F.col("__v").alias("value"),
        F.col("__w").alias("timestamp"),  # window index as pseudo-time
    )
    return _over_time(inner_vals, op, param)


# -- label manipulation ---------------------------------------------------


def _resign(df: DataFrame, new_labels) -> DataFrame:
    return df.select(
        new_labels.alias("labels"), "value"
    ).withColumn("signature", signature_expr("labels")).select(
        "signature", "labels", "value"
    )


def _map_set(labels, key: str, value) -> Any:
    cleaned = F.map_filter(labels, lambda k, _: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), value))


def _str_args(args, ctx, func, n) -> list[str]:
    out = []
    for a in args:
        if not isinstance(a, StringLit):
            raise ValueError(f"{func}() expects string literals")
        out.append(a.value)
    if len(out) < n:
        raise ValueError(f"{func}() needs {n} string arguments")
    return out


def _label_replace_expr(dst: str, repl: str, src: str, regex: str):
    """The label_replace transform as a pure Column over `labels` —
    shared by the instant path and the tiled (range) path."""
    if not re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
        raise ValueError(f"label_replace: invalid destination label {dst!r}")
    anchored = f"^(?:{regex})$"
    src_val = F.coalesce(F.try_element_at("labels", F.lit(src)), F.lit(""))
    matched = src_val.rlike(anchored)
    newval = F.regexp_replace(src_val, anchored, repl)
    labels = F.col("labels")
    return (
        F.when(matched & (newval != ""), _map_set(labels, dst, newval))
        .when(matched, F.map_filter(labels, lambda k, _: k != F.lit(dst)))
        .otherwise(labels)
    )


def _label_join_expr(dst: str, sep: str, srcs: list[str]):
    """The label_join transform as a pure Column over `labels`."""
    if not re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
        raise ValueError(f"label_join: invalid destination label {dst!r}")
    parts = [
        F.coalesce(F.try_element_at("labels", F.lit(s)), F.lit("")) for s in srcs
    ]
    joined = F.concat_ws(sep, *parts)
    labels = F.col("labels")
    return F.when(
        joined != "", _map_set(labels, dst, joined)
    ).otherwise(F.map_filter(labels, lambda k, _: k != F.lit(dst)))


def _label_replace(node: Call, ctx: _Ctx) -> DataFrame:
    kind, v = _eval(node.args[0], ctx)
    dst, repl, src, regex = _str_args(node.args[1:5], ctx, "label_replace", 4)
    return _resign(v, _label_replace_expr(dst, repl, src, regex))


def _label_join(node: Call, ctx: _Ctx) -> DataFrame:
    kind, v = _eval(node.args[0], ctx)
    strs = _str_args(node.args[1:], ctx, "label_join", 3)
    return _resign(v, _label_join_expr(strs[0], strs[1], strs[2:]))


# -- histogram_quantile ---------------------------------------------------


def _histogram_quantile(
    phi: float, vec: DataFrame, extra_keys: tuple[str, ...] = ()
) -> DataFrame:
    """Prometheus histogram_quantile over cumulative le-bucket series:
    group by labels-minus-le, order buckets by le, pick the first
    bucket whose cumulative count reaches φ·total, interpolate
    linearly inside it (lower bound 0 for the first bucket; the +Inf
    bucket clamps to the highest finite le) — the same branch
    structure ts_latency_slo_p95 pins against its oracle. One groupBy;
    bucket counts per series are the le-grid size (tiny)."""
    le_raw = F.coalesce(F.try_element_at("labels", F.lit("le")), F.lit(""))
    le_val = (
        F.when(le_raw.isin("+Inf", "Inf", "inf"), F.lit(float("inf")))
        .otherwise(le_raw.try_cast("double"))  # ANSI-safe: bad le → null → dropped
    )
    rest = F.map_filter(F.col("labels"), lambda k, _: k != F.lit("le"))
    pre = vec.filter(le_val.isNotNull()).select(
        signature_expr(rest).alias("signature"),
        rest.alias("labels"),
        *extra_keys,
        le_val.alias("__le"),
        F.col("value").alias("__c"),
    )
    g = _hashable_group(
        pre,
        ["signature", *extra_keys],
        "labels",
        F.sort_array(F.collect_list(F.struct("__le", "__c"))).alias("__b"),
    )
    b = F.col("__b")
    n = F.size(b)
    total = F.element_at(b, n)["__c"]
    target = F.lit(phi) * total
    # first bucket index reaching the target count
    hits = F.filter(b, lambda x: x["__c"] >= target)
    first_hit = F.element_at(hits, 1)
    idx = F.array_position(b, first_hit).cast("int")
    cur_le = first_hit["__le"]
    cur_c = first_hit["__c"]
    prev_le = F.when(idx > 1, F.element_at(b, idx - 1)["__le"]).otherwise(F.lit(0.0))
    prev_c = F.when(idx > 1, F.element_at(b, idx - 1)["__c"]).otherwise(F.lit(0.0))
    # highest finite le (for the +Inf clamp)
    finite = F.filter(b, lambda x: ~F.isnan(x["__le"]) & (x["__le"] != float("inf")))
    hi_fin = F.element_at(finite, F.size(finite))["__le"]
    interp = prev_le + (cur_le - prev_le) * (target - prev_c) / (cur_c - prev_c)
    val = (
        F.when(total <= 0, F.lit(None))
        .when(cur_le == float("inf"), hi_fin)
        .otherwise(interp)
    )
    return g.select(
        "signature", "labels", *extra_keys, val.cast("double").alias("value")
    ).filter(F.col("value").isNotNull())


def _info_enrich(
    v: DataFrame, isel: Selector, ctx: _Ctx,
    extra_keys: tuple[str, ...] = ()
) -> DataFrame:
    """The join behind info(): latest-per-series info selection, left
    join on the (job, instance) identity, data labels merged under
    the series' own labels, duplicate identities raising at execution
    (the many-to-one guard device). extra_keys carries the window id
    through in range mode — enrichment is per-row, so the tiled grid
    passes straight through."""
    info = _instant_selector(isel, ctx)
    idk = F.struct(
        F.coalesce(
            F.try_element_at(F.col("labels"), F.lit("job")), F.lit("")
        ).alias("j"),
        F.coalesce(
            F.try_element_at(F.col("labels"), F.lit("instance")), F.lit("")
        ).alias("i"),
    )
    data = F.map_filter(
        F.col("labels"),
        lambda k, _: ~k.isin("__name__", "job", "instance"),
    )
    inf = info.select(idk.alias("__k"), data.alias("__data")).withColumn(
        "__n1", F.count("*").over(Window.partitionBy("__k"))
    )
    vv = v.select("labels", *extra_keys, "value", idk.alias("__k"))
    j = vv.join(inf, "__k", "left")
    guard = F.raise_error(
        F.lit("info() found multiple matching info series for an "
              "identity (job, instance) — narrow the selector")
    ).cast("double")
    merged = F.when(
        F.col("__data").isNotNull(),
        F.map_concat(
            F.col("labels"),
            F.map_filter(
                F.col("__data"),
                lambda k, _: ~F.array_contains(
                    F.map_keys(F.col("labels")), k
                ),
            ),
        ),
    ).otherwise(F.col("labels"))
    val = F.when(
        F.col("__n1").isNull() | (F.col("__n1") == 1), F.col("value")
    ).otherwise(guard)
    return (
        j.select(merged.alias("labels"), *extra_keys, val.alias("value"))
        .withColumn("signature", signature_expr("labels"))
        .select("signature", "labels", *extra_keys, "value")
    )


def _histogram_fraction(
    lo: float, hi: float, vec: DataFrame, extra_keys: tuple[str, ...] = ()
) -> DataFrame:
    """histogram_fraction(lo, hi, b) over CLASSIC cumulative le-bucket
    series — the estimated fraction of observations in (lo, hi].
    Prometheus defines the function for native histograms only; this
    engine classic-expands native histograms at ingest, so the classic
    form is the faithful continuation: cumulative count at x linearly
    interpolated inside the bucket containing x (first-bucket lower
    bound 0 and +Inf clamped to the highest finite le — exactly
    histogram_quantile's conventions), fraction = (F(hi) − F(lo)) /
    total, clamped to [0, 1]. Same one-groupBy shape as
    histogram_quantile."""
    le_raw = F.coalesce(F.try_element_at("labels", F.lit("le")), F.lit(""))
    le_val = (
        F.when(le_raw.isin("+Inf", "Inf", "inf"), F.lit(float("inf")))
        .otherwise(le_raw.try_cast("double"))
    )
    rest = F.map_filter(F.col("labels"), lambda k, _: k != F.lit("le"))
    pre = vec.filter(le_val.isNotNull()).select(
        signature_expr(rest).alias("signature"),
        rest.alias("labels"),
        *extra_keys,
        le_val.alias("__le"),
        F.col("value").alias("__c"),
    )
    g = _hashable_group(
        pre,
        ["signature", *extra_keys],
        "labels",
        F.sort_array(F.collect_list(F.struct("__le", "__c"))).alias("__b"),
    )
    b = F.col("__b")
    n = F.size(b)
    total = F.element_at(b, n)["__c"]

    def cum_at(x):
        # buckets with le <= x count fully; the next bucket (the one
        # containing x) interpolates, except the +Inf bucket whose
        # width is unbounded — there the cumulative clamps at the
        # highest finite le's count
        below = F.filter(b, lambda e: e["__le"] <= x)
        nb = F.size(below)
        c_below = F.when(nb > 0, F.element_at(below, nb)["__c"]).otherwise(
            F.lit(0.0))
        le_below = F.when(nb > 0, F.element_at(below, nb)["__le"]).otherwise(
            F.lit(0.0))
        above = F.filter(b, lambda e: e["__le"] > x)
        nxt = F.element_at(above, 1)  # null when x ≥ every le
        interp = c_below + (nxt["__c"] - c_below) * (x - le_below) / (
            nxt["__le"] - le_below
        )
        return (
            F.when(x <= F.lit(0.0), F.lit(0.0))
            .when(F.size(above) == 0, total)
            .when(nxt["__le"] == float("inf"), c_below)
            .otherwise(interp)
        )

    lo_c = F.lit(float("-inf")) if lo == float("-inf") else F.lit(float(lo))
    hi_c = F.lit(float("inf")) if hi == float("inf") else F.lit(float(hi))
    cum_hi = F.lit(0.0) if hi == float("-inf") else (
        total if hi == float("inf") else cum_at(hi_c))
    cum_lo = F.lit(0.0) if lo == float("-inf") else (
        total if lo == float("inf") else cum_at(lo_c))
    frac = F.greatest(
        F.least((cum_hi - cum_lo) / total, F.lit(1.0)), F.lit(0.0))
    val = F.when(total > 0, frac)
    return g.select(
        "signature", "labels", *extra_keys, val.cast("double").alias("value")
    ).filter(F.col("value").isNotNull())


# -- aggregation operators -------------------------------------------------


def _group_map_sql(by, without) -> str:
    """SQL text of the by/without label projection over the ``labels``
    column — composed as a string so the full grouping expression
    parses in ONE py4j round-trip (§7.3; a map_filter lambda built
    through the Column API costs ~40 ms of socket chatter per call)."""
    if by is not None:
        if not by:
            return "map_filter(labels, (k, v) -> false)"
        arr = "array(" + ", ".join(sql_str_lit(k) for k in by) + ")"
        return f"map_filter(labels, (k, v) -> array_contains({arr}, k))"
    if without is not None:
        if not without:
            return "labels"
        arr = "array(" + ", ".join(sql_str_lit(k) for k in without) + ")"
        return f"map_filter(labels, (k, v) -> NOT array_contains({arr}, k))"
    # plain sum(...) aggregates everything into one group
    return "map_filter(labels, (k, v) -> false)"


def _group_map(by, without):
    return F.expr(_group_map_sql(by, without))


def _eval_agg(node: Agg, ctx: _Ctx):
    kind, vec = _eval(node.expr, ctx)
    if kind != "vector":
        raise ValueError(f"{node.op} expects an instant vector")
    gm_sql = _group_map_sql(node.by, node.without)
    keyed = vec.select(
        F.expr(signature_sql_text(gm_sql)).alias("__gsig"),
        F.expr(gm_sql).alias("__glabels"),
        "signature",
        "labels",
        "value",
    )
    if node.op in ("topk", "bottomk"):
        k = int(_scalar_arg(node.param, ctx, node.op))
        order = (
            [F.col("value").desc(), F.col("signature")]
            if node.op == "topk"
            else [F.col("value").asc(), F.col("signature")]
        )
        w = Window.partitionBy("__gsig").orderBy(*order)
        out = (
            keyed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("signature", "labels", "value")
        )
        return ("vector", out)
    if node.op == "limitk":
        # Prometheus 3.x experimental aggregation: "sample k input
        # series" — the spec leaves WHICH k unspecified, so this engine
        # makes the choice deterministic (md5 of the series signature,
        # then signature): any engine, any partitioning, any run picks
        # the same k series per group. Original labels survive, like
        # topk.
        k = int(_scalar_arg(node.param, ctx, node.op))
        w = Window.partitionBy("__gsig").orderBy(
            F.md5("signature"), F.col("signature")
        )
        out = (
            keyed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("signature", "labels", "value")
        )
        return ("vector", out)
    if node.op == "limit_ratio":
        # Prometheus 3.x experimental: deterministic hash sampling of
        # approximately r of the input series, with the complement
        # contract limit_ratio(r) ∪ limit_ratio(-(1-r)) = everything.
        # h = first 15 md5 hex chars of the signature / 2^60 ∈ [0,1):
        # r >= 0 keeps h <= r, r < 0 keeps h > 1+r — replayable in any
        # SQL engine (CAST('0x'||substr(md5(sig),1,15) AS BIGINT)).
        r = _scalar_arg(node.param, ctx, node.op)
        if not -1.0 <= r <= 1.0:
            raise ValueError("limit_ratio expects a ratio in [-1, 1]")
        h = _hash60("signature").cast("double") / F.lit(float(1 << 60))
        cond = (h <= F.lit(float(r))) if r >= 0 else (h > F.lit(1.0 + float(r)))
        return ("vector", keyed.filter(cond).select("signature", "labels", "value"))
    if node.op == "quantile":
        phi = _scalar_arg(node.param, ctx, node.op)
        agg = _hashable_group(
            keyed,
            ["__gsig"],
            "__glabels",
            F.sort_array(F.collect_list("value")).alias("__a"),
        )
        n = F.size("__a")
        rank = F.lit(phi) * (n - F.lit(1)).cast("double")
        lo = F.floor(rank).cast("int")
        frac = rank - lo.cast("double")
        v_lo = F.element_at("__a", lo + 1)
        v_hi = F.element_at("__a", F.least(lo + 2, n))
        val = (v_lo + (v_hi - v_lo) * frac).cast("double")
        out = agg.select(
            F.col("__gsig").alias("signature"), "labels", val.alias("value")
        )
        return ("vector", out)
    if node.op == "count_values":
        if not isinstance(node.param, StringLit):
            raise ValueError("count_values expects a label-name string")
        dst = node.param.value
        if not re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
            raise ValueError(f"count_values: invalid label name {dst!r}")
        # group key gains the stringified sample value as a label
        val_str = F.col("value").cast("string")
        gmap2 = F.map_concat(
            F.map_filter(F.col("__glabels"), lambda k, _: k != F.lit(dst)),
            F.create_map(F.lit(dst), val_str),
        )
        out = _hashable_group(
            keyed.select(gmap2.alias("labels"), "value"),
            [signature_expr("labels").alias("signature")],
            "labels",
            F.count("*").cast("double").alias("value"),
        ).select("signature", "labels", "value")
        return ("vector", out)
    exprs = {
        "sum": F.sum(F.col("value").cast(_DEC)).cast("double"),
        "min": F.min("value"),
        "max": F.max("value"),
        "count": F.count("*").cast("double"),
        "group": F.lit(1.0),
    }
    if node.op in exprs:
        out = _hashable_group(
            keyed, ["__gsig"], "__glabels", exprs[node.op].alias("value")
        )
    elif node.op == "avg":
        out = _hashable_group(
            keyed,
            ["__gsig"],
            "__glabels",
            (
                F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*")
            ).alias("value"),
        )
    elif node.op in ("stddev", "stdvar"):
        y = F.col("value").cast("decimal(18,2)")
        var = F.greatest(
            (
                F.sum(y * y).cast("double")
                - F.sum(y).cast("double") * F.sum(y).cast("double")
                / F.count("*")
            )
            / F.count("*"),
            F.lit(0.0),
        )
        out = _hashable_group(
            keyed,
            ["__gsig"],
            "__glabels",
            (F.sqrt(var) if node.op == "stddev" else var).alias("value"),
        )
    else:
        raise ValueError(f"unsupported aggregation {node.op!r}")
    return (
        "vector",
        out.select(F.col("__gsig").alias("signature"), "labels", "value"),
    )


# -- binary operators ------------------------------------------------------


def _match_key(match):
    """The vector-matching key: full signature by default, or the
    signature of the on/ignoring label subset (built as ONE parsed
    SQL expression — §7.3)."""
    if match is None:
        return F.col("signature")
    kind, names = match
    gm = _group_map_sql(
        tuple(names) if kind == "on" else None,
        tuple(names) if kind == "ignoring" else None,
    )
    return F.expr(signature_sql_text(gm))


# value-transform / presentation calls that pass series labels through
# row-wise (vector in args[0], labels untouched)
_LABEL_PRESERVING_CALLS = frozenset(
    ("round", "clamp", "clamp_min", "clamp_max", "sgn",
     "sort", "sort_desc", "sort_by_label", "sort_by_label_desc")
)


def _unique_series(node) -> bool:
    """True when the node's evaluated vector STRUCTURALLY holds at most
    one row per output label set (per window in range mode): the vector
    is produced by a per-(signature[, window]) aggregation, or is a
    row-wise value transform / filter of such a vector. label_replace /
    label_join (signature rewrites that can collide), info() enrichment
    and group_left/group_right outputs are deliberately NOT on the list
    — their collisions are exactly what the runtime one-to-one guard
    exists to catch. Conservative: False for anything unproven."""
    if isinstance(node, (Selector, Subquery)):
        return True  # per-series grouped selection
    if isinstance(node, Unary):
        return _unique_series(node.expr)
    if isinstance(node, Agg):
        if node.op in ("topk", "bottomk", "limitk", "limit_ratio"):
            return _unique_series(node.expr)  # row filters of the input
        return True  # grouped by the output label set
    if isinstance(node, Call):
        f = node.func
        if f in _RANGE_FUNCS:
            return True  # _per_series aggregation
        if f in ("absent", "absent_over_time", "vector", "timestamp",
                 "histogram_quantile", "histogram_fraction"):
            return True  # grouped, or at most one synthetic series
        if f in _MATH_FUNCS or f in _DATE_FUNCS or f in _LABEL_PRESERVING_CALLS:
            return bool(node.args) and _unique_series(node.args[0])
        return False  # label_replace / label_join / info / unknown
    if isinstance(node, BinOp):
        if node.group is not None:
            return False  # copied extras can collide output label sets
        if node.op in ("and", "unless"):
            return _unique_series(node.lhs)
        # or: lhs rows plus rhs rows whose match key lhs lacks — equal
        # output labels imply equal match keys, so the anti-join keeps
        # the union collision-free when both sides are unique.
        # scalar-vector forms and 1:1 matching emit one row per
        # (lhs-)series when both operands are unique.
        return _unique_series(node.lhs) and _unique_series(node.rhs)
    return True  # Number / StringLit (scalar operands)


def _pinned_labels(node) -> dict:
    """Labels provably pinned to ONE constant, non-empty value on every
    output row of the node's vector (EQ matchers threaded through
    label-preserving transforms). Used to prove that stripping an
    ignoring() set cannot merge two distinct series. Conservative:
    unknown shapes pin nothing."""
    if isinstance(node, Selector):
        out = {m.name: m.value for m in node.matchers
               if m.type == "EQ" and m.value != ""}
        if node.name is not None:
            out["__name__"] = node.name
        return out
    if isinstance(node, (Subquery, Unary)):
        return _pinned_labels(node.expr)
    if isinstance(node, Agg):
        inner = _pinned_labels(node.expr)
        if node.op in ("topk", "bottomk", "limitk", "limit_ratio"):
            return inner  # row filters keep labels
        if node.by is not None:
            by = set(node.by)
            return {k: v for k, v in inner.items() if k in by}
        if node.without is not None:
            wo = set(node.without)
            return {k: v for k, v in inner.items() if k not in wo}
        return {}  # plain agg: one all-up group, no labels
    if isinstance(node, Call):
        f = node.func
        if f == "quantile_over_time" and len(node.args) == 2:
            return _pinned_labels(node.args[1])
        if f == "histogram_quantile" and len(node.args) >= 2:
            inner = _pinned_labels(node.args[1])
            inner.pop("le", None)
            return inner
        if (f in _RANGE_FUNCS or f in _MATH_FUNCS or f in _DATE_FUNCS
                or f == "timestamp" or f in _LABEL_PRESERVING_CALLS):
            return _pinned_labels(node.args[0]) if node.args else {}
        return {}
    if isinstance(node, BinOp):
        if node.group is not None:
            gkind, extras = node.group
            out = _pinned_labels(node.lhs if gkind == "left" else node.rhs)
            for e in extras:
                out.pop(e, None)  # copied labels vary per partner
            return out
        if node.op in ("and", "unless"):
            return _pinned_labels(node.lhs)
        if node.op == "or":
            l = _pinned_labels(node.lhs)
            r = _pinned_labels(node.rhs)
            return {k: v for k, v in l.items() if r.get(k) == v}
        if _const_scalar(node.lhs) is not None:
            return _pinned_labels(node.rhs)
        # vector-scalar and 1:1 vector matching both carry the lhs labels
        return _pinned_labels(node.lhs)
    return {}


def _unique_per_match_key(node, match) -> bool:
    """True when the node's vector STRUCTURALLY holds at most one row
    per _match_key(match) value (per window in range mode) — the
    runtime one-to-one / one-side count guard is then provably
    redundant and its window (sort + shuffle) is elided. Conservative:
    False whenever uniqueness cannot be proven from the AST alone, so
    the guard (and Prometheus's many-to-many error) stays."""
    if match is None:
        return _unique_series(node)
    kind, names = match
    names = set(names)
    if kind == "on":
        if isinstance(node, Agg) and node.op not in (
                "topk", "bottomk", "limitk", "limit_ratio", "count_values"):
            # group key ⊆ on-labels: the match key determines the group
            if node.by is not None and set(node.by) <= names:
                return True
            if node.by is None and node.without is None:
                return True  # single all-up group
        if (isinstance(node, Call)
                and node.func in ("label_replace", "label_join")
                and len(node.args) >= 2
                and isinstance(node.args[1], StringLit)
                and node.args[1].value not in names):
            # rewrites a label OUTSIDE the key: key values untouched
            return _unique_per_match_key(node.args[0], match)
        return False
    # ignoring(I): unique per full label set with every ignored label
    # pinned constant — stripping I cannot merge two distinct series
    if _unique_series(node) and names <= set(_pinned_labels(node)):
        return True
    if isinstance(node, Agg) and node.op not in (
            "topk", "bottomk", "limitk", "limit_ratio", "count_values"):
        if node.without is not None and names <= set(node.without):
            return True  # output labels already exclude I
        if node.by is not None and not (set(node.by) & names):
            return True  # key strips nothing from the group labels
        if node.by is None and node.without is None:
            return True
    return False


def _copy_group_extras(labels, olabels_col: str, extras) -> "F.Column":
    """The group_left/group_right label-copy rule, shared by the
    instant and tiled paths: each listed extra label is copied from
    the one side onto the many side's label set; an absent/empty
    source label removes the destination (Prometheus's
    empty-equals-absent rule)."""
    new_labels = labels
    for e in extras:
        src = F.try_element_at(olabels_col, F.lit(e))
        # map_filter builds the expression eagerly, so closing over the
        # loop variable is safe — no late binding
        dropped = F.map_filter(new_labels, lambda k, _: k != F.lit(e))
        new_labels = F.when(
            src.isNotNull() & (src != ""), _map_set(new_labels, e, src)
        ).otherwise(dropped)
    return new_labels


def _eval_many_to_one(node: BinOp, lv: DataFrame, rv: DataFrame):
    """Many-to-one vector matching (group_left/group_right): every
    many-side series joins its one-side partner on the on/ignoring
    key; the listed extra labels are copied from the one side onto the
    many side's label set (an absent/empty source label removes the
    destination — Prometheus's empty-equals-absent rule) and the
    result re-signs. The one side must be unique per key — a duplicate
    raises AT EXECUTION, Prometheus's "multiple matches for labels"
    error, never a silent row multiplication. Both operands are
    per-series instant vectors, so the join and the one-side
    uniqueness window shuffle series-count rows, never points."""
    gkind, extras = node.group
    many, one = (lv, rv) if gkind == "left" else (rv, lv)
    one_node = node.rhs if gkind == "left" else node.lhs
    key = _match_key(node.match)
    one_s = one.select(
        key.alias("__k"),
        F.col("labels").alias("__olabels"),
        F.col("value").alias("__ov"),
    )
    # the count window exists only to raise Prometheus's
    # multiple-matches error; a one side PROVABLY unique per key skips
    # it (and the sort + shuffle it costs)
    ok = None
    if not _unique_per_match_key(one_node, node.match):
        one_s = one_s.withColumn(
            "__n1", F.count("*").over(Window.partitionBy("__k"))
        )
        ok = F.col("__n1") == 1
    many_s = many.select(key.alias("__k"), "labels", F.col("value").alias("__mv"))
    j = many_s.join(one_s, "__k")
    guard = F.raise_error(
        F.lit("PromQL many-to-one matching found multiple matches on the "
              "one side (narrow the on/ignoring key)")
    ).cast("double")

    def _guarded(x):
        return x if ok is None else F.when(ok, x).otherwise(guard)

    new_labels = _copy_group_extras(F.col("labels"), "__olabels", extras)
    a, b = (
        (F.col("__mv"), F.col("__ov"))
        if gkind == "left"
        else (F.col("__ov"), F.col("__mv"))
    )
    if node.op in _CMP_OPS:
        cond = {"==": a == b, "!=": a != b, ">": a > b,
                "<": a < b, ">=": a >= b, "<=": a <= b}[node.op]
        if node.bool_mode:
            val = _guarded(cond.cast("double"))
            out = j.select(new_labels.alias("labels"), val.alias("value"))
        else:
            val = _guarded(a)
            out = (
                j.select(new_labels.alias("labels"), val.alias("value"),
                         cond.alias("__c"))
                .filter("__c")
                .drop("__c")
            )
    else:
        expr = {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
                "%": a % b, "^": F.pow(a, b), "atan2": F.atan2(a, b)}[node.op]
        val = _guarded(expr.cast("double"))
        out = j.select(new_labels.alias("labels"), val.alias("value"))
    out = out.withColumn("signature", signature_expr("labels")).select(
        "signature", "labels", "value"
    )
    return ("vector", out)


def _eval_vv(node: BinOp, lv: DataFrame, rv: DataFrame):
    """Vector-vector binary op with 1:1 matching (Prometheus
    on/ignoring; group_left/right routes to _eval_many_to_one). Both
    sides are per-series instant vectors — series-count rows — so the
    match join and the per-key count windows are small keyed shuffles,
    never point-level. A key matching more than one series on either
    side raises AT EXECUTION (raise_error in the live projection),
    exactly Prometheus's many-to-many error, never a silent
    duplicate."""
    if node.group is not None:
        return _eval_many_to_one(node, lv, rv)
    key = _match_key(node.match)
    wl = Window.partitionBy("__k")
    left = lv.select(
        key.alias("__k"), "signature", "labels", F.col("value").alias("__lv")
    )
    right = rv.select(key.alias("__k"), F.col("value").alias("__rv"))
    # the per-key count windows exist only to raise Prometheus's
    # many-to-many error; a side PROVABLY unique per key skips its
    # window (and the sort + shuffle it costs)
    ok = None
    if not _unique_per_match_key(node.lhs, node.match):
        left = left.withColumn("__nl", F.count("*").over(wl))
        ok = F.col("__nl") == 1
    if not _unique_per_match_key(node.rhs, node.match):
        right = right.withColumn("__nr", F.count("*").over(wl))
        c = F.col("__nr") == 1
        ok = c if ok is None else (ok & c)
    j = left.join(right, "__k")
    guard = F.raise_error(
        F.lit("PromQL vector matching is not one-to-one (use on/ignoring "
              "to narrow the match key)")
    ).cast("double")

    def _guarded(x):
        return x if ok is None else F.when(ok, x).otherwise(guard)

    a, b = F.col("__lv"), F.col("__rv")
    if node.op in _CMP_OPS:
        cond = {"==": a == b, "!=": a != b, ">": a > b,
                "<": a < b, ">=": a >= b, "<=": a <= b}[node.op]
        if node.bool_mode:
            val = _guarded(cond.cast("double"))
            out = j.select("signature", "labels", val.alias("value"))
        else:
            val = _guarded(a)
            out = j.select(
                "signature", "labels", val.alias("value"), cond.alias("__c")
            ).filter("__c").drop("__c")
        return ("vector", out)
    expr = {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
            "%": a % b, "^": F.pow(a, b), "atan2": F.atan2(a, b)}[node.op]
    val = _guarded(expr.cast("double"))
    return ("vector", j.select("signature", "labels", val.alias("value")))


def _eval_setop(node: BinOp, lv: DataFrame, rv: DataFrame):
    """PromQL set operators over instant vectors: `and` keeps lhs
    series whose match key exists on the rhs (left-semi), `unless`
    the complement (left-anti), `or` is lhs plus the rhs series whose
    key lhs lacks — all keyed joins on series-count relations."""
    key = _match_key(node.match)
    left = lv.withColumn("__k", key)
    right = rv.withColumn("__k", key)
    if node.op == "and":
        out = left.join(right.select("__k").distinct(), "__k", "left_semi")
    elif node.op == "unless":
        out = left.join(right.select("__k").distinct(), "__k", "left_anti")
    else:  # or
        extra = right.join(left.select("__k").distinct(), "__k", "left_anti")
        out = left.unionByName(extra)
    return ("vector", out.select("signature", "labels", "value"))


def _eval_binop(node: BinOp, ctx: _Ctx):
    lk, lv = _eval(node.lhs, ctx)
    rk, rv = _eval(node.rhs, ctx)
    if node.op in ("and", "or", "unless"):
        if lk != "vector" or rk != "vector":
            raise ValueError(f"{node.op} requires two instant vectors")
        return _eval_setop(node, lv, rv)
    if lk == "scalar" and rk == "scalar":
        return ("scalar", _scalar_binop(node.op, lv, rv, node.bool_mode))
    if lk == "vector" and rk == "vector":
        return _eval_vv(node, lv, rv)
    if node.group is not None:
        raise ValueError(
            "group_left/group_right is only valid between two instant vectors"
        )
    vec, scalar, vec_left = (lv, rv, True) if lk == "vector" else (rv, lv, False)
    val = F.col("value")
    s = F.lit(float(scalar))
    a, b = (val, s) if vec_left else (s, val)
    if node.op in _CMP_OPS:
        cond = {
            "==": a == b, "!=": a != b, ">": a > b,
            "<": a < b, ">=": a >= b, "<=": a <= b,
        }[node.op]
        if node.bool_mode:
            return ("vector", vec.withColumn("value", cond.cast("double")))
        return ("vector", vec.filter(cond))
    expr = {
        "+": a + b,
        "-": a - b,
        "*": a * b,
        "/": a / b,
        "%": a % b,
        "^": F.pow(a, b),
        "atan2": F.atan2(a, b),
    }[node.op]
    return ("vector", vec.withColumn("value", expr.cast("double")))


def _scalar_binop(op: str, a: float, b: float, bool_mode: bool) -> float:
    import math

    if op in _CMP_OPS:
        r = {"==": a == b, "!=": a != b, ">": a > b,
             "<": a < b, ">=": a >= b, "<=": a <= b}[op]
        return 1.0 if r else 0.0
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b if b != 0 else math.inf if a > 0 else -math.inf if a < 0 else math.nan
    if op == "%":
        return math.fmod(a, b) if b != 0 else math.nan
    if op == "^":
        return a ** b
    if op == "atan2":
        return math.atan2(a, b)
    raise ValueError(f"unknown operator {op!r}")


# ------------------------------------------------------- range evaluation


def eval_range(
    samples: DataFrame,
    expr,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """Step-range evaluation — the Grafana /query_range shape — for the
    TILED expression class, computed in ONE pass (no per-step replan,
    no repeated scans): the range [start, end] is tiled by step-width
    windows and every window evaluates independently. Returns
    [signature, labels, t_ms (window END, the evaluation timestamp),
    value].

    Supported shapes (anything else raises with a clear message —
    arbitrary expressions would need a per-step replan, which is the
    scan-multiplicity class this engine bans):
    - instant selector: last sample per window per series (no
      cross-window lookback carry — a window without samples emits no
      point, where Prometheus would carry up to the lookback; this is
      the tile semantics range_func_by_step already pins);
    - EVERY range function with R = k*step (k a whole number up to
      RANGE_TILE_MAX_K — covers Grafana's $__rate_interval ~ 4x step;
      a non-multiple range or a larger fan-out raises loudly), each
      window's range isolated (reset and smoothing state never leaks
      between windows; overlapping windows share samples via a bounded
      ≤k-way explode, still ONE scan): rate/increase/delta/irate/
      idelta/resets/changes/deriv/predict_linear/holt_winters and all
      <agg>_over_time incl. quantile_over_time; histogram_quantile
      composes over any tiled inner;
    - subqueries under avg/sum/min/max/count/last_over_time when the
      grid step and the subquery range are whole multiples of the
      subquery step: the inner expression (the FULL tiled class)
      evaluates once as its own S-grid and fans into the outer
      windows — `max_over_time(rate(m[5m])[30m:5m])` as a panel;
    - grouping aggregations (sum/avg/min/max/count/stddev/stdvar/
      group/quantile/count_values/topk/bottomk/limitk/limit_ratio,
      by/without) over any tiled expression — aggregated per window;
    - `@`-pinned subtrees (every selector carries @, no time()): one
      instant evaluation at the anchors — start()/end() resolve to
      the RANGE bounds — fanned across the step grid (the constant
      reference line Grafana draws with `m @ end()`);
    - binary operators COMPOSING tiled expressions per window: scalar
      arithmetic/comparisons (with bool), 1:1 vector matching with
      on/ignoring (duplicate keys within a window raise, exactly the
      instant evaluator's many-to-many error), and the set operators
      and/or/unless — each side evaluates in its own single pass and
      the match is one keyed join per (key, window), so the
      error-ratio dashboard graph `sum by(k)(increase(a[s])) /
      on(k) sum by(k)(increase(b[s]))` costs two tiled passes + one
      series-grain join, never a per-step replan. Many-to-one
      group_left/group_right matches per (key, window) with the
      instant path's label-copy and one-side-uniqueness guard; unary
      minus composes.
    - value transforms over any tiled expression: the math functions
      (abs/ceil/floor/exp/ln/log2/log10/sqrt/sgn) and
      round/clamp/clamp_min/clamp_max with scalar bounds;
    - timestamp(selector) per window, info() enrichment (anchored at
      the range end), the sort family (presentation-level unwrap, the
      serving layer orders off the AST), and histogram_fraction over
      any tiled inner.
    """
    if isinstance(expr, str):
        expr = parse(expr)
    if step_ms <= 0 or end_ms < start_ms:
        raise ValueError("eval_range needs step_ms > 0 and end >= start")
    ctx = _Ctx(samples, end_ms, lookback_ms)
    per_win = _tiled_values(expr, start_ms, end_ms, step_ms, ctx)
    t_col = (F.lit(start_ms) + (F.col("__w") + 1) * F.lit(step_ms)).cast("long")
    return per_win.select("signature", "labels", t_col.alias("t_ms"), "value")


def _resolve_range_at(node, start_ms: int, end_ms: int):
    """Resolve every `@` anchor under range-query semantics — start()
    and end() are the RANGE's bounds, not the per-step time — and
    report whether the subtree is FULLY pinned: it contains at least
    one selector/subquery, every one carries `@` (directly, or through
    an enclosing pinned subquery), and no step-dependent call (time())
    appears. A fully pinned subtree has the same value at every step,
    so eval_range evaluates it ONCE as an instant query at its own
    anchors and fans the per-series result across the window grid —
    the semantics Grafana relies on when it emits `@` in range queries
    (VERDICT r7 next-round #6). Returns (rewritten_node, pinned)."""
    import dataclasses

    state = {"any": False, "unpinned": False, "step_dep": False}

    def rw(n, under_pinned: bool):
        if isinstance(n, Selector):
            state["any"] = True
            if n.at_ms is None:
                if not under_pinned:
                    state["unpinned"] = True
                return n
            at = (start_ms if n.at_ms == "start"
                  else end_ms if n.at_ms == "end" else n.at_ms)
            return dataclasses.replace(n, at_ms=at)
        if isinstance(n, Subquery):
            state["any"] = True
            at = n.at_ms
            if at is None and not under_pinned:
                state["unpinned"] = True
            if at is not None:
                at = (start_ms if at == "start"
                      else end_ms if at == "end" else at)
            # a pinned subquery anchors its whole inner expression —
            # inner selectors without @ stay relative to that anchor
            inner = rw(n.expr, under_pinned or at is not None)
            return dataclasses.replace(n, expr=inner, at_ms=at)
        if isinstance(n, Call):
            if n.func == "time":
                state["step_dep"] = True
            return dataclasses.replace(
                n, args=tuple(rw(a, under_pinned) for a in n.args)
            )
        if isinstance(n, Agg):
            return dataclasses.replace(
                n,
                expr=rw(n.expr, under_pinned),
                param=(rw(n.param, under_pinned)
                       if n.param is not None else None),
            )
        if isinstance(n, BinOp):
            return dataclasses.replace(
                n, lhs=rw(n.lhs, under_pinned), rhs=rw(n.rhs, under_pinned)
            )
        if isinstance(n, Unary):
            return dataclasses.replace(n, expr=rw(n.expr, under_pinned))
        return n  # Number / StringLit

    out = rw(node, False)
    pinned = state["any"] and not state["unpinned"] and not state["step_dep"]
    return out, pinned


def _tile_k(range_ms: int, step_ms: int) -> int:
    """Window fan-out factor for a range function in tiled range mode.
    The function range must be a whole multiple of the step: each
    sample then lands in exactly k = range/step consecutive windows —
    a bounded explode over the one scan, never a per-step rescan. The
    multiple is capped at RANGE_TILE_MAX_K so the shuffle cannot be
    multiplied unboundedly; past the cap we fail loudly rather than
    silently degrade."""
    if range_ms % step_ms != 0:
        raise ValueError(
            "tiled evaluation needs the function range to be "
            f"a whole multiple of the step ({range_ms}ms vs {step_ms}ms)"
        )
    k = range_ms // step_ms
    if k > RANGE_TILE_MAX_K:
        raise ValueError(
            f"tiled evaluation: range/step fan-out {k} exceeds "
            f"RANGE_TILE_MAX_K={RANGE_TILE_MAX_K} — widen the step or "
            "narrow the function range"
        )
    return int(k)


def _tiled_values(node, start_ms: int, end_ms: int, step_ms: int, ctx: _Ctx) -> DataFrame:
    """Per-(series, window) values for the tiled expression class:
    [signature, labels, __w, value] with __w the 0-based window index
    over (start, end] — one scan, one keyed shuffle."""
    n_tiles = -(-(end_ms - start_ms) // step_ms)

    node, pinned = _resolve_range_at(node, start_ms, end_ms)
    if pinned:
        # one instant pass at the (now numeric) anchors, then the
        # per-series result replicated across the window grid — a
        # narrow explode over an already-aggregated frame, never a
        # per-step rescan of the fact table
        inst = eval_instant(ctx.samples, node, end_ms, ctx.lookback_ms)
        if n_tiles <= 0:
            return inst.filter(F.lit(False)).select(
                "signature", "labels",
                F.lit(0).cast("long").alias("__w"), "value",
            )
        wins = F.sequence(
            F.lit(0).cast("long"), F.lit(int(n_tiles - 1)).cast("long")
        )
        return inst.select(
            "signature", "labels", F.explode(wins).alias("__w"), "value"
        )

    def tiles(sel: Selector, range_ms: int | None = None) -> DataFrame:
        if sel.at_ms is not None:
            # fully-pinned subtrees take the instant fast path above;
            # reaching here means a pinned selector is entangled with
            # step-varying evaluation in a shape the tiled class
            # cannot split (defensive — BinOp/Agg/Call all recurse)
            raise ValueError(
                "eval_range: @ selector mixed into a step-varying "
                "subtree the tiled evaluator cannot split"
            )
        k = 1 if range_ms is None else _tile_k(range_ms, step_ms)
        df = _base(
            sel, ctx,
            (F.col("timestamp") > start_ms - sel.offset_ms - (k - 1) * step_ms)
            & (F.col("timestamp") <= end_ms - sel.offset_ms),
        )
        win = F.floor(
            (F.col("timestamp") - F.lit(start_ms - sel.offset_ms) - F.lit(1))
            / F.lit(step_ms)
        ).cast("long")
        if k == 1:
            return df.select(
                "signature", "labels", win.alias("__w"), "timestamp", "value"
            ).filter((F.col("__w") >= 0) & (F.col("__w") < n_tiles))
        # range = k*step (the Grafana $__rate_interval shape): a sample
        # whose base tile is w0 is inside the range of the k
        # consecutive windows [w0, w0+k-1] — a bounded explode (≤k
        # output rows per sample) clipped to the grid. The scan-time
        # timestamp filter above makes the clipped bounds ascending,
        # so sequence() never reverses; the defensive filter keeps the
        # degenerate start==end grid empty.
        base = df.select(
            "signature", "labels", win.alias("__w0"), "timestamp", "value"
        ).filter(
            (F.col("__w0") < n_tiles) & (F.col("__w0") + (k - 1) >= 0)
        )
        wins = F.sequence(
            F.greatest(F.col("__w0"), F.lit(0).cast("long")),
            F.least(
                F.col("__w0") + F.lit(int(k - 1)).cast("long"),
                F.lit(int(n_tiles - 1)).cast("long"),
            ),
        )
        return base.select(
            "signature", "labels", F.explode(wins).alias("__w"),
            "timestamp", "value",
        )

    if isinstance(node, Selector):
        if node.range_ms is not None:
            raise ValueError("eval_range: bare range selector — wrap in a function")
        pts = tiles(node)
        return (
            pts.groupBy("signature", "__w")
            .agg(
                F.max(F.struct("timestamp", "value")).alias("__top"),
                F.first("labels").alias("labels"),
            )
            .select("signature", "labels", "__w",
                    F.col("__top.value").alias("value"))
        )
    if (
        isinstance(node, Call)
        and node.func in ("rate", "increase", "delta", "resets", "changes",
                          "irate", "idelta")
        and len(node.args) == 1
        and isinstance(node.args[0], Selector)
        and node.args[0].range_ms is not None
    ):
        sel = node.args[0]
        pts = tiles(sel, sel.range_ms)
        if node.func in ("resets", "changes"):
            # per-window counterpart of changes_resets: one lag over a
            # (series, window, time) sort, integer counts — a window
            # with ≥1 point emits (0 when no pairs), like the batch op
            w = Window.partitionBy("signature", "__w").orderBy(
                "timestamp", "value")
            seq = pts.select(
                "signature", "labels", "__w", "value",
                F.lag("value").over(w).alias("__prev"),
            )
            cond = (
                (F.col("value") < F.col("__prev"))
                if node.func == "resets"
                else (F.col("value") != F.col("__prev"))
            )
            out = _hashable_group(
                seq,
                ["signature", "__w"],
                "labels",
                F.count(F.when(F.col("__prev").isNotNull() & cond, 1))
                .cast("double").alias("value"),
            )
            return out.select("signature", "labels", "__w", "value")
        if node.func in ("irate", "idelta"):
            # last two samples per (series, window) — the tiled twin of
            # operators/timeseries.irate (reset-corrected DECIMAL step
            # for irate; raw diff for idelta, like Prometheus)
            w = Window.partitionBy("signature", "__w").orderBy(
                F.desc("timestamp"), F.desc("value"))
            d = F.col("value").cast(_DEC)
            ranked = pts.select(
                "signature", "labels", "__w",
                F.col("timestamp").alias("__t"), d.alias("__v"),
                F.row_number().over(w).alias("__rn"),
            ).filter(F.col("__rn") <= 2)
            agg = _hashable_group(
                ranked,
                ["signature", "__w"],
                "labels",
                F.max(F.when(F.col("__rn") == 1, F.col("__v"))).alias("__v1"),
                F.max(F.when(F.col("__rn") == 2, F.col("__v"))).alias("__v2"),
                F.max(F.when(F.col("__rn") == 1, F.col("__t"))).alias("__t1"),
                F.max(F.when(F.col("__rn") == 2, F.col("__t"))).alias("__t2"),
            ).filter(F.col("__t2").isNotNull() & (F.col("__t1") > F.col("__t2")))
            if node.func == "idelta":
                val = (F.col("__v1") - F.col("__v2")).cast("double")
            else:
                step = F.when(
                    F.col("__v1") >= F.col("__v2"), F.col("__v1") - F.col("__v2")
                ).otherwise(F.col("__v1"))
                val = (
                    step.cast("double")
                    / (F.col("__t1") - F.col("__t2")) * F.lit(1000.0)
                )
            return agg.select(
                "signature", "labels", "__w", val.alias("value"))
        w = Window.partitionBy("signature", "__w").orderBy("timestamp", "value")
        dec = F.col("value").cast(_DEC)
        prev = F.lag(dec).over(w)
        if node.func == "delta":
            step = F.when(prev.isNull(), F.lit(None)).otherwise(dec - prev)
        else:
            step = (
                F.when(prev.isNull(), F.lit(None))
                .when(dec >= prev, dec - prev)
                .otherwise(dec)
            )
        stepped = pts.select(
            "signature", "labels", "__w", step.alias("__step")
        ).filter(F.col("__step").isNotNull())
        out = _hashable_group(
            stepped,
            ["signature", "__w"],
            "labels",
            F.sum("__step").cast("double").alias("value"),
        )
        if node.func == "rate":
            out = out.withColumn(
                "value", F.col("value") / F.lit(sel.range_ms / 1000.0))
        return out.select("signature", "labels", "__w", "value")
    if (
        isinstance(node, Call)
        and node.func.endswith("_over_time")
        and node.func in _RANGE_FUNCS
        and len(node.args) == 1
        and isinstance(node.args[0], Selector)
        and node.args[0].range_ms is not None
    ):
        sel = node.args[0]
        op = node.func[: -len("_over_time")]
        return _over_time(tiles(sel, sel.range_ms), op, extra_keys=("__w",)).select(
            "signature", "labels", "__w", "value"
        )
    if (
        isinstance(node, Call)
        and node.func == "quantile_over_time"
        and len(node.args) == 2
        and isinstance(node.args[1], Selector)
        and node.args[1].range_ms is not None
    ):
        phi = _const_scalar(node.args[0])
        if phi is None:
            raise ValueError("quantile_over_time expects a scalar φ")
        sel = node.args[1]
        return _over_time(
            tiles(sel, sel.range_ms), "quantile", phi, extra_keys=("__w",)
        ).select("signature", "labels", "__w", "value")
    if (
        isinstance(node, Call)
        and node.func in ("holt_winters", "double_exponential_smoothing")
        and len(node.args) == 3
        and isinstance(node.args[0], Selector)
        and node.args[0].range_ms is not None
    ):
        sel = node.args[0]
        sf_ = _const_scalar(node.args[1])
        tf_ = _const_scalar(node.args[2])
        if sf_ is None or tf_ is None:
            raise ValueError("holt_winters expects scalar smoothing factors")
        pts = tiles(sel, sel.range_ms)
        out = _tsops.holt_winters(
            pts, key_cols=["signature", "__w"], sf=sf_, tf=tf_, out="__v"
        )
        dim = pts.select("signature", "labels").dropDuplicates(["signature"])
        return out.join(F.broadcast(dim), "signature").select(
            "signature", "labels", "__w",
            F.col("__v").cast("double").alias("value"),
        )
    if (
        isinstance(node, Call)
        and node.func in ("deriv", "predict_linear")
        and node.args
        and isinstance(node.args[0], Selector)
        and node.args[0].range_ms is not None
    ):
        sel = node.args[0]
        # per-window least squares from the five exact DECIMAL
        # accumulators (linreg_slope's construction keyed by window);
        # ONE map-combinable aggregation, no sort
        pts = tiles(sel, sel.range_ms)
        x = (F.col("timestamp") - F.lit(start_ms)).cast("decimal(20,0)")
        y = F.col("value").cast("decimal(18,2)")
        agg = _hashable_group(
            pts,
            ["signature", "__w"],
            "labels",
            F.count("*").alias("__n"),
            F.sum(x).cast("double").alias("__sx"),
            F.sum(y).cast("double").alias("__sy"),
            F.sum(x * x).cast("double").alias("__sxx"),
            F.sum(x * y).cast("double").alias("__sxy"),
        )
        n = F.col("__n")
        denom = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
        agg = agg.filter(denom != 0)  # zero x-variance → slope undefined
        slope_ms = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom
        if node.func == "deriv":
            val = slope_ms * F.lit(1000.0)
        else:
            t_sec = (
                _const_scalar(node.args[1]) if len(node.args) > 1 else None
            )
            if t_sec is None:
                raise ValueError("predict_linear expects a scalar horizon")
            intercept = (F.col("__sy") - slope_ms * F.col("__sx")) / n
            # extrapolate from each window's END (its evaluation time,
            # relative to the t0=start centering) — the instant
            # evaluator's at_ms = range_end + t convention per window
            at = (F.col("__w") + 1) * F.lit(float(step_ms)) + F.lit(
                t_sec * 1000.0
            )
            val = intercept + slope_ms * at
        return agg.select(
            "signature", "labels", "__w", val.cast("double").alias("value")
        )
    if (
        isinstance(node, Call)
        and node.func in ("absent", "absent_over_time")
        and len(node.args) == 1
    ):
        # per-window absence marker — the alert-graph shape ("draw 1
        # where the series is gone"). absent_over_time(sel[R]) asks
        # whether the selector has any raw point inside each window's
        # range, which is exactly what tiles() (with its k-fan-out for
        # R = k*step) yields; absent(X)
        # works over any tiled inner. One anti-join of the window
        # grid (n_tiles rows, driver-range) against the distinct
        # present windows — no extra scan of the fact table.
        arg = node.args[0]
        if node.func == "absent_over_time":
            if not (isinstance(arg, Selector) and arg.range_ms is not None):
                raise ValueError("absent_over_time() takes a range selector")
            inner = tiles(
                dataclasses.replace(arg, range_ms=None), arg.range_ms)
        else:
            inner = _tiled_values(arg, start_ms, end_ms, step_ms, ctx)
        present = inner.select("__w").distinct()
        allw = ctx.samples.sparkSession.range(max(int(n_tiles), 0)).select(
            F.col("id").cast("long").alias("__w")
        )
        return allw.join(present, "__w", "left_anti").select(
            F.lit("").alias("signature"),
            F.map_from_arrays(
                F.array().cast("array<string>"),
                F.array().cast("array<string>"),
            ).alias("labels"),
            "__w",
            F.lit(1.0).alias("value"),
        )
    if isinstance(node, Call) and node.func.endswith("_over_time") and (
        (
            node.func[: -len("_over_time")] in
            ("avg", "sum", "min", "max", "count", "last", "present",
             "stddev", "stdvar", "mad")
            and len(node.args) == 1
            and isinstance(node.args[0], Subquery)
        )
        or (
            node.func == "quantile_over_time"
            and len(node.args) == 2
            and isinstance(node.args[1], Subquery)
        )
    ):
        # subquery in RANGE mode — `max_over_time(rate(m[5m])[30m:5m])`
        # as a query_range panel. The inner expression evaluates ONCE
        # as its own tiled grid at the subquery step S over
        # [start-offset-R, end-offset]; because the grid step G is a
        # multiple of S, every outer window's subquery tiles land on
        # that same S-grid (the instant path's per-anchor tiling,
        # shared), so inner tile j feeds the outer windows w with
        # (w+1)·(G/S) < j+1 ≤ (w+1)·(G/S) + R/S — a bounded explode of
        # ≤⌈(R/S)/(G/S)⌉ windows per inner value, series grain, never
        # a per-step replan.
        if node.func == "quantile_over_time":
            sq_param = _const_scalar(node.args[0])
            if sq_param is None:
                raise ValueError("quantile_over_time expects a scalar φ")
            sq = node.args[1]
        else:
            sq_param = None
            sq = node.args[0]
        if sq.at_ms is not None:
            raise ValueError(
                "eval_range: @ on a subquery inside a step-varying "
                "subtree the tiled evaluator cannot split"
            )
        S, R = sq.step_ms, sq.range_ms
        if step_ms % S or R % S:
            raise ValueError(
                "eval_range: subquery needs the grid step and the "
                f"subquery range to be whole multiples of the subquery "
                f"step ({step_ms}ms grid, {R}ms range vs {S}ms step)"
            )
        m, r = step_ms // S, R // S
        if -(-r // m) > RANGE_TILE_MAX_K:
            raise ValueError(
                f"eval_range: subquery window fan-out {-(-r // m)} "
                f"exceeds RANGE_TILE_MAX_K={RANGE_TILE_MAX_K}"
            )
        if n_tiles <= 0:
            empty = ctx.samples.sparkSession.range(0)
            return empty.select(
                F.lit("").alias("signature"),
                F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast("array<string>"),
                ).alias("labels"),
                F.col("id").cast("long").alias("__w"),
                F.lit(0.0).alias("value"),
            )
        inner = _tiled_values(
            sq.expr, start_ms - sq.offset_ms - R, end_ms - sq.offset_ms,
            S, ctx,
        )
        j = F.col("__w")
        w_lo = (F.floor((j - F.lit(int(r)) + F.lit(int(m)))
                        / F.lit(int(m))) - 1).cast("long")
        w_hi = (F.floor(j / F.lit(int(m))) - 1).cast("long")
        fanned = (
            inner.select(
                "signature", "labels",
                F.col("__w").alias("timestamp"),  # inner tile id as the
                # pseudo-time last_over_time orders by (instant path's
                # convention)
                "value", w_lo.alias("__lo"), w_hi.alias("__hi"),
            )
            .filter(
                (F.col("__hi") >= 0)
                & (F.col("__lo") < n_tiles)
                & (F.col("__lo") <= F.col("__hi"))
            )
            .select(
                "signature", "labels", "timestamp", "value",
                F.explode(
                    F.sequence(
                        F.greatest(F.col("__lo"), F.lit(0).cast("long")),
                        F.least(F.col("__hi"),
                                F.lit(int(n_tiles - 1)).cast("long")),
                    )
                ).alias("__w"),
            )
        )
        return _over_time(
            fanned, node.func[: -len("_over_time")], sq_param,
            extra_keys=("__w",),
        ).select("signature", "labels", "__w", "value")
    if isinstance(node, Call) and node.func == "info" and node.args:
        # info() in range mode: the tiled inner grid enriched per row
        # with the info metric's data labels — the info selection
        # anchors at the range END (the latest resource identity, the
        # Grafana panel semantics); __w passes straight through
        import dataclasses as _dc

        v = _tiled_values(node.args[0], start_ms, end_ms, step_ms, ctx)
        if len(node.args) > 1:
            isel = node.args[1]
            if not isinstance(isel, Selector) or isel.range_ms is not None:
                raise ValueError(
                    "info() second argument must be an instant selector")
            if isel.name is None and not any(
                m.name == "__name__" for m in isel.matchers
            ):
                isel = _dc.replace(isel, name="target_info")
        else:
            isel = Selector("target_info", ())
        return _info_enrich(v, isel, ctx, extra_keys=("__w",))
    if (
        isinstance(node, Call)
        and node.func == "timestamp"
        and len(node.args) == 1
        and isinstance(node.args[0], Selector)
        and node.args[0].range_ms is None
    ):
        # timestamp() per window: the last sample's own timestamp (in
        # seconds) — same grouped top-struct as the bare selector
        pts = tiles(node.args[0])
        return (
            pts.groupBy("signature", "__w")
            .agg(
                F.max(F.struct("timestamp", "value")).alias("__top"),
                F.first("labels").alias("labels"),
            )
            .select(
                "signature", "labels", "__w",
                (F.col("__top.timestamp") / F.lit(1000.0))
                .cast("double").alias("value"),
            )
        )
    if isinstance(node, Call) and node.func in (
        "sort", "sort_desc", "sort_by_label", "sort_by_label_desc"
    ):
        # ordering is API presentation only (the engine's matrices are
        # unordered sets — the serving layer reads the label list off
        # the AST and orders the assembled series); vector identity
        # here, exactly the instant evaluator's rule
        if node.func.startswith("sort_by_label"):
            if len(node.args) < 2:
                raise ValueError(
                    f"{node.func}() expects a vector and >=1 label name")
            for a in node.args[1:]:
                if not isinstance(a, StringLit):
                    raise ValueError(
                        f"{node.func}() label names must be strings")
        return _tiled_values(node.args[0], start_ms, end_ms, step_ms, ctx)
    if (
        isinstance(node, Call)
        and node.func == "histogram_quantile"
        and len(node.args) == 2
    ):
        phi = _const_scalar(node.args[0])
        if phi is None:
            raise ValueError("histogram_quantile expects a scalar φ")
        vec = _tiled_values(node.args[1], start_ms, end_ms, step_ms, ctx)
        return _histogram_quantile(float(phi), vec, extra_keys=("__w",))
    if (
        isinstance(node, Call)
        and node.func == "histogram_fraction"
        and len(node.args) == 3
    ):
        lo = _const_scalar(node.args[0])
        hi = _const_scalar(node.args[1])
        if lo is None or hi is None:
            raise ValueError("histogram_fraction expects scalar bounds")
        vec = _tiled_values(node.args[2], start_ms, end_ms, step_ms, ctx)
        return _histogram_fraction(
            float(lo), float(hi), vec, extra_keys=("__w",))
    if isinstance(node, Call) and node.func == "vector" and len(node.args) == 1:
        # a constant series present at EVERY step — the `or vector(0)`
        # no-data fallback every dashboard uses; n_tiles rows from a
        # driver range, no scan
        s = _const_scalar(node.args[0])
        if s is None:
            raise ValueError("eval_range: vector() expects a scalar literal")
        return ctx.samples.sparkSession.range(max(int(n_tiles), 0)).select(
            F.lit("").alias("signature"),
            F.map_from_arrays(
                F.array().cast("array<string>"),
                F.array().cast("array<string>"),
            ).alias("labels"),
            F.col("id").cast("long").alias("__w"),
            F.lit(float(s)).cast("double").alias("value"),
        )
    if isinstance(node, Call) and node.func in ("label_replace",
                                                "label_join"):
        # pure per-row label transforms — the same Column expression
        # the instant path applies, re-signed with __w carried through
        v = _tiled_values(node.args[0], start_ms, end_ms, step_ms, ctx)
        if node.func == "label_replace":
            dst, repl, src, regex = _str_args(
                node.args[1:5], ctx, "label_replace", 4)
            new_labels = _label_replace_expr(dst, repl, src, regex)
        else:
            strs = _str_args(node.args[1:], ctx, "label_join", 3)
            new_labels = _label_join_expr(strs[0], strs[1], strs[2:])
        return (
            v.select(new_labels.alias("labels"), "__w", "value")
            .withColumn("signature", signature_expr("labels"))
            .select("signature", "labels", "__w", "value")
        )
    if isinstance(node, Call) and node.func in _MATH_FUNCS:
        v = _tiled_values(node.args[0], start_ms, end_ms, step_ms, ctx)
        fn = _MATH_FUNCS[node.func]
        return v.withColumn("value", fn(F.col("value")).cast("double"))
    if isinstance(node, Call) and node.func in ("round", "clamp",
                                                "clamp_min", "clamp_max"):
        v = _tiled_values(node.args[0], start_ms, end_ms, step_ms, ctx)
        args = [_const_scalar(a) for a in node.args[1:]]
        if any(a is None for a in args):
            raise ValueError(f"{node.func}() bounds must be scalars")
        if node.func == "round":
            to = args[0] if args else 1.0
            expr = F.floor(F.col("value") / F.lit(to) + F.lit(0.5)) * F.lit(to)
        elif node.func == "clamp":
            expr = F.least(
                F.greatest(F.col("value"), F.lit(args[0])), F.lit(args[1])
            )
        elif node.func == "clamp_min":
            expr = F.greatest(F.col("value"), F.lit(args[0]))
        else:
            expr = F.least(F.col("value"), F.lit(args[0]))
        return v.withColumn("value", expr.cast("double"))
    if isinstance(node, Agg):
        if node.op not in ("sum", "avg", "min", "max", "count",
                           "stddev", "stdvar", "group", "quantile",
                           "count_values",
                           "topk", "bottomk", "limitk", "limit_ratio"):
            raise ValueError(
                f"eval_range supports sum/avg/min/max/count/stddev/"
                f"stdvar/group/quantile/count_values/topk/bottomk/"
                f"limitk/limit_ratio grouping, not {node.op}"
            )
        per = _tiled_values(node.expr, start_ms, end_ms, step_ms, ctx)
        if node.op == "limit_ratio":
            # deterministic hash sampling (see _eval_agg): the keep set
            # is a pure function of the series signature, so in range
            # mode it is the SAME series at every step — one filter on
            # the tiled rows, no window
            r = _const_scalar(node.param)
            if r is None or not -1.0 <= r <= 1.0:
                raise ValueError("limit_ratio expects a scalar in [-1, 1]")
            h = _hash60("signature").cast("double") / F.lit(float(1 << 60))
            cond = (h <= F.lit(float(r))) if r >= 0 else (
                h > F.lit(1.0 + float(r))
            )
            return per.filter(cond).select("signature", "labels", "__w", "value")
        if node.op == "limitk":
            # k deterministic series per (group, window) — membership
            # re-evaluates per step over the series PRESENT in that
            # window, ordered by (md5(signature), signature)
            k = _const_scalar(node.param)
            if k is None:
                raise ValueError("limitk expects a scalar k")
            gsig = F.expr(signature_sql_text(
                _group_map_sql(node.by, node.without)))
            w = Window.partitionBy(gsig, "__w").orderBy(
                F.md5("signature"), F.col("signature")
            )
            return (
                per.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= int(k))
                .select("signature", "labels", "__w", "value")
            )
        if node.op in ("topk", "bottomk"):
            # the k ranked INPUT series per (group, window) — series
            # membership re-evaluates each step, the Grafana "top 5
            # per step" shape; ties break by signature, deterministic
            k = _const_scalar(node.param)
            if k is None:
                raise ValueError(f"{node.op} expects a scalar k")
            gsig = F.expr(signature_sql_text(
                _group_map_sql(node.by, node.without)))
            order = (
                [F.col("value").desc(), F.col("signature")]
                if node.op == "topk"
                else [F.col("value").asc(), F.col("signature")]
            )
            w = Window.partitionBy(gsig, "__w").orderBy(*order)
            return (
                per.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= int(k))
                .select("signature", "labels", "__w", "value")
            )
        gm_sql = _group_map_sql(node.by, node.without)
        keyed = per.select(
            F.expr(signature_sql_text(gm_sql)).alias("__gsig"),
            F.expr(gm_sql).alias("__glabels"),
            "__w",
            "value",
        )
        if node.op == "count_values":
            # per-window value histogram — the discrete-value heatmap
            # shape; identical label construction to the instant path,
            # with __w joined into the group key
            if not isinstance(node.param, StringLit):
                raise ValueError("count_values expects a label-name string")
            dst = node.param.value
            if not re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", dst):
                raise ValueError(f"count_values: invalid label name {dst!r}")
            gmap2 = F.map_concat(
                F.map_filter(F.col("__glabels"), lambda k, _: k != F.lit(dst)),
                F.create_map(F.lit(dst), F.col("value").cast("string")),
            )
            return _hashable_group(
                keyed.select(gmap2.alias("labels"), "__w", "value"),
                [signature_expr("labels").alias("signature"), "__w"],
                "labels",
                F.count("*").cast("double").alias("value"),
            ).select("signature", "labels", "__w", "value")
        if node.op == "quantile":
            phi = _const_scalar(node.param)
            if phi is None:
                raise ValueError("quantile grouping expects a scalar φ")
            agg = _hashable_group(
                keyed,
                ["__gsig", "__w"],
                "__glabels",
                F.sort_array(F.collect_list("value")).alias("__a"),
            )
            n = F.size("__a")
            rank = F.lit(float(phi)) * (n - F.lit(1)).cast("double")
            lo = F.floor(rank).cast("int")
            frac = rank - lo.cast("double")
            v_lo = F.element_at("__a", lo + 1)
            v_hi = F.element_at("__a", F.least(lo + 2, n))
            val = (v_lo + (v_hi - v_lo) * frac).cast("double")
            return agg.select(
                F.col("__gsig").alias("signature"), "labels", "__w",
                val.alias("value"),
            )
        y = F.col("value").cast("decimal(18,2)")
        var = F.greatest(
            (
                F.sum(y * y).cast("double")
                - F.sum(y).cast("double") * F.sum(y).cast("double")
                / F.count("*")
            )
            / F.count("*"),
            F.lit(0.0),
        )
        exprs = {
            "sum": F.sum(F.col("value").cast(_DEC)).cast("double"),
            "avg": F.sum(F.col("value").cast(_DEC)).cast("double")
            / F.count("*"),
            "min": F.min("value"),
            "max": F.max("value"),
            "count": F.count("*").cast("double"),
            "stddev": F.sqrt(var),
            "stdvar": var,
            "group": F.max(F.lit(1.0)),
        }
        out = _hashable_group(
            keyed,
            ["__gsig", "__w"],
            "__glabels",
            exprs[node.op].cast("double").alias("value"),
        )
        return out.select(
            F.col("__gsig").alias("signature"), "labels", "__w", "value"
        )
    if isinstance(node, Unary):
        v = _tiled_values(node.expr, start_ms, end_ms, step_ms, ctx)
        if node.op == "-":
            v = v.withColumn("value", (-F.col("value")).cast("double"))
        return v
    if isinstance(node, BinOp):
        return _tiled_binop(node, start_ms, end_ms, step_ms, ctx)
    raise ValueError(
        "eval_range supports selectors, rate/increase/delta(m[step]), "
        "<agg>_over_time(m[step]), grouping aggregations, and binary "
        "operators composing those — got an unsupported shape"
    )


def _const_scalar(node) -> float | None:
    """A compile-time scalar subtree (numbers and arithmetic over
    them), or None if the subtree touches samples."""
    if isinstance(node, Number):
        return node.value
    if isinstance(node, Unary):
        v = _const_scalar(node.expr)
        if v is None:
            return None
        return -v if node.op == "-" else v
    if isinstance(node, BinOp):
        a, b = _const_scalar(node.lhs), _const_scalar(node.rhs)
        if a is None or b is None:
            return None
        return _scalar_binop(node.op, a, b, node.bool_mode)
    return None


def _tiled_many_to_one(node: BinOp, lv: DataFrame, rv: DataFrame) -> DataFrame:
    """Many-to-one matching per (key, window): the instant
    _eval_many_to_one semantics with __w joined into the match key and
    the one-side uniqueness window — every many-side series finds its
    one-side partner within its own step, extras copied, result
    re-signed. Same scale shape: the join and the uniqueness count
    shuffle (series × windows) rows, never points."""
    gkind, extras = node.group
    many, one = (lv, rv) if gkind == "left" else (rv, lv)
    one_node = node.rhs if gkind == "left" else node.lhs
    key = _match_key(node.match)
    one_s = one.select(
        key.alias("__k"), "__w",
        F.col("labels").alias("__olabels"),
        F.col("value").alias("__ov"),
    )
    # per-window twin of the instant guard elision: the one side skips
    # its count window when it is provably unique per (key, window)
    ok = None
    if not _unique_per_match_key(one_node, node.match):
        one_s = one_s.withColumn(
            "__n1", F.count("*").over(Window.partitionBy("__k", "__w"))
        )
        ok = F.col("__n1") == 1
    many_s = many.select(
        key.alias("__k"), "__w", "labels", F.col("value").alias("__mv")
    )
    j = many_s.join(one_s, ["__k", "__w"])
    guard = F.raise_error(
        F.lit("PromQL many-to-one matching found multiple matches on the "
              "one side within a step (narrow the on/ignoring key)")
    ).cast("double")

    def _guarded(x):
        return x if ok is None else F.when(ok, x).otherwise(guard)

    new_labels = _copy_group_extras(F.col("labels"), "__olabels", extras)
    a, b = (
        (F.col("__mv"), F.col("__ov"))
        if gkind == "left"
        else (F.col("__ov"), F.col("__mv"))
    )
    if node.op in _CMP_OPS:
        cond = {"==": a == b, "!=": a != b, ">": a > b,
                "<": a < b, ">=": a >= b, "<=": a <= b}[node.op]
        if node.bool_mode:
            val = _guarded(cond.cast("double"))
            out = j.select(new_labels.alias("labels"), "__w",
                           val.alias("value"))
        else:
            val = _guarded(a)
            out = (
                j.select(new_labels.alias("labels"), "__w",
                         val.alias("value"), cond.alias("__c"))
                .filter("__c")
                .drop("__c")
            )
    else:
        expr = {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
                "%": a % b, "^": F.pow(a, b), "atan2": F.atan2(a, b)}[node.op]
        val = _guarded(expr.cast("double"))
        out = j.select(new_labels.alias("labels"), "__w", val.alias("value"))
    return out.withColumn("signature", signature_expr("labels")).select(
        "signature", "labels", "__w", "value"
    )


def _tiled_binop(
    node: BinOp, start_ms: int, end_ms: int, step_ms: int, ctx: _Ctx
) -> DataFrame:
    """Binary operators over per-window vectors — the instant
    evaluator's matching semantics applied per (key, window)."""
    if node.group is not None:
        lv = _tiled_values(node.lhs, start_ms, end_ms, step_ms, ctx)
        rv = _tiled_values(node.rhs, start_ms, end_ms, step_ms, ctx)
        return _tiled_many_to_one(node, lv, rv)
    ls, rs = _const_scalar(node.lhs), _const_scalar(node.rhs)
    if ls is not None and rs is not None:
        raise ValueError("eval_range needs at least one vector operand")
    if ls is not None or rs is not None:
        if node.op in ("and", "or", "unless"):
            raise ValueError(f"{node.op} requires two instant vectors")
        vec_node = node.lhs if rs is not None else node.rhs
        vec = _tiled_values(vec_node, start_ms, end_ms, step_ms, ctx)
        val = F.col("value")
        s = F.lit(float(rs if rs is not None else ls))
        a, b = (val, s) if rs is not None else (s, val)
        if node.op in _CMP_OPS:
            cond = {"==": a == b, "!=": a != b, ">": a > b,
                    "<": a < b, ">=": a >= b, "<=": a <= b}[node.op]
            if node.bool_mode:
                return vec.withColumn("value", cond.cast("double"))
            return vec.filter(cond)
        expr = {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
                "%": a % b, "^": F.pow(a, b), "atan2": F.atan2(a, b)}[node.op]
        return vec.withColumn("value", expr.cast("double"))

    def _tiled_scalar(n) -> DataFrame | None:
        """scalar(X) as a per-window scalar relation [__w, __sv] —
        the share-of-total graph `m / scalar(sum(m))`. Prometheus
        semantics: a window whose inner vector is not exactly one
        series yields NaN (and a window with no inner rows simply has
        no entry — the left join below turns that into NaN too)."""
        if not (isinstance(n, Call) and n.func == "scalar"
                and len(n.args) == 1):
            return None
        inner = _tiled_values(n.args[0], start_ms, end_ms, step_ms, ctx)
        return inner.groupBy("__w").agg(
            F.when(F.count("*") == 1, F.first("value"))
            .otherwise(F.lit(float("nan"))).alias("__sv")
        )

    lsc, rsc = _tiled_scalar(node.lhs), _tiled_scalar(node.rhs)
    if lsc is not None and rsc is not None:
        raise ValueError("eval_range needs at least one vector operand")
    if lsc is not None or rsc is not None:
        if node.op in ("and", "or", "unless"):
            raise ValueError(f"{node.op} requires two instant vectors")
        vec_node = node.lhs if rsc is not None else node.rhs
        vec = _tiled_values(vec_node, start_ms, end_ms, step_ms, ctx)
        sc = rsc if rsc is not None else lsc
        j = vec.join(sc, "__w", "left")
        s = F.coalesce(F.col("__sv"), F.lit(float("nan")))
        val = F.col("value")
        a, b = (val, s) if rsc is not None else (s, val)
        if node.op in _CMP_OPS:
            cond = {"==": a == b, "!=": a != b, ">": a > b,
                    "<": a < b, ">=": a >= b, "<=": a <= b}[node.op]
            if node.bool_mode:
                return j.select("signature", "labels", "__w",
                                cond.cast("double").alias("value"))
            return j.filter(cond).select(
                "signature", "labels", "__w", "value")
        expr = {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
                "%": a % b, "^": F.pow(a, b), "atan2": F.atan2(a, b)}[node.op]
        return j.select("signature", "labels", "__w",
                        expr.cast("double").alias("value"))
    lv = _tiled_values(node.lhs, start_ms, end_ms, step_ms, ctx)
    rv = _tiled_values(node.rhs, start_ms, end_ms, step_ms, ctx)
    key = _match_key(node.match)
    if node.op in ("and", "or", "unless"):
        left = lv.withColumn("__k", key)
        right = rv.withColumn("__k", key)
        rk = right.select("__k", "__w").distinct()
        if node.op == "and":
            out = left.join(rk, ["__k", "__w"], "left_semi")
        elif node.op == "unless":
            out = left.join(rk, ["__k", "__w"], "left_anti")
        else:
            extra = right.join(
                left.select("__k", "__w").distinct(),
                ["__k", "__w"], "left_anti",
            )
            out = left.unionByName(extra)
        return out.select("signature", "labels", "__w", "value")
    wl = Window.partitionBy("__k", "__w")
    left = lv.select(
        key.alias("__k"), "signature", "labels", "__w",
        F.col("value").alias("__lv"),
    )
    right = rv.select(key.alias("__k"), "__w", F.col("value").alias("__rv"))
    # per-window twin of the instant guard elision: a side provably
    # unique per (key, window) skips its count window
    ok = None
    if not _unique_per_match_key(node.lhs, node.match):
        left = left.withColumn("__nl", F.count("*").over(wl))
        ok = F.col("__nl") == 1
    if not _unique_per_match_key(node.rhs, node.match):
        right = right.withColumn("__nr", F.count("*").over(wl))
        c = F.col("__nr") == 1
        ok = c if ok is None else (ok & c)
    j = left.join(right, ["__k", "__w"])
    guard = F.raise_error(
        F.lit("PromQL vector matching is not one-to-one within a step "
              "(use on/ignoring to narrow the match key)")
    ).cast("double")

    def _guarded(x):
        return x if ok is None else F.when(ok, x).otherwise(guard)

    a, b = F.col("__lv"), F.col("__rv")
    if node.op in _CMP_OPS:
        cond = {"==": a == b, "!=": a != b, ">": a > b,
                "<": a < b, ">=": a >= b, "<=": a <= b}[node.op]
        if node.bool_mode:
            val = _guarded(cond.cast("double"))
            return j.select("signature", "labels", "__w", val.alias("value"))
        val = _guarded(a)
        return (
            j.select("signature", "labels", "__w", val.alias("value"),
                     cond.alias("__c"))
            .filter("__c")
            .drop("__c")
        )
    expr = {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
            "%": a % b, "^": F.pow(a, b), "atan2": F.atan2(a, b)}[node.op]
    val = _guarded(expr.cast("double"))
    return j.select("signature", "labels", "__w", val.alias("value"))
