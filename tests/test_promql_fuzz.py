"""Property test: parse(format_expr(ast)) == ast over RANDOM ASTs —
the grammar-wide identity the hand-picked round-trip list cannot
exhaust (escaping in matcher values, modifier stacking, operator
nesting, group-modifier label lists). Parser-only: no SparkSession."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from monolith_spark.labels import LabelMatcher
from monolith_spark.promql import (
    _AGG_OPS,
    Agg,
    BinOp,
    Call,
    Number,
    Selector,
    StringLit,
    Subquery,
    Unary,
    _resolve_range_at,
    format_expr,
    parse,
)

# words the grammar treats specially at the metric-name position
_RESERVED = _AGG_OPS | {
    "and", "or", "unless", "by", "without", "offset", "bool",
    "on", "ignoring", "group_left", "group_right",
}

_ident_label = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,4}", fullmatch=True)
# Prometheus 3.x UTF-8 names: anything printable, including the
# escape-relevant characters and the inf/nan number-literal edge —
# the formatter must quote whatever cannot re-lex as a bare name
_label = st.one_of(
    _ident_label,
    st.text(alphabet=st.sampled_from(list('ab .-日"\\\n')), min_size=1,
            max_size=6),
)
# lexer identifier shape: colons allowed INSIDE (recording-rule names)
# but not leading — the same restriction the tokenizer enforces
_metric = st.one_of(
    st.from_regex(
        r"[a-zA-Z_][a-zA-Z0-9_:]{0,5}", fullmatch=True
    ).filter(lambda s: s not in _RESERVED),
    st.sampled_from(["inf", "NaN", "Inf", "my metric", "a.b", "метрика"]),
    st.text(alphabet=st.sampled_from(list('ab .-日"\\\n')), min_size=1,
            max_size=6),
)
# matcher values: printable-ish text including the escape-relevant
# characters (quote, backslash, newline)
_value = st.text(
    alphabet=st.sampled_from(list('abz09 _"\\\n.*+?[]{}()|^$')), max_size=8
)
_mtype = st.sampled_from(["EQ", "NEQ", "RE", "NRE"])
_dur_ms = st.integers(min_value=1, max_value=10**10)
_at_ms = st.one_of(
    st.integers(min_value=0, max_value=2 * 10**12).map(
        lambda v: v - v % 1000  # whole seconds — the lexer reads seconds
    ),
    st.sampled_from(["start", "end"]),  # the @ start()/@ end() anchors
)
_num = st.floats(min_value=0, max_value=1e12, allow_nan=False,
                 allow_infinity=False)


@st.composite
def _selector(draw, with_range: bool):
    name = draw(st.one_of(st.none(), _metric))
    n = draw(st.integers(0, 2))
    matchers = tuple(
        LabelMatcher(draw(_label), draw(_value), draw(_mtype))
        for _ in range(n)
    )
    return Selector(
        name,
        matchers,
        draw(_dur_ms) if with_range else None,
        draw(st.sampled_from([0, 0, draw(_dur_ms)])),
        draw(st.one_of(st.none(), _at_ms)),
    )


def _exprs(inner):
    instant = _selector(with_range=False)
    rng = _selector(with_range=True)

    unary = st.builds(Unary, st.sampled_from(["-", "+"]), inner)
    call1 = st.builds(
        lambda f, a: Call(f, (a,)),
        st.sampled_from(["abs", "sqrt", "sgn", "absent"]),
        inner,
    )
    rate = st.builds(lambda s: Call("rate", (s,)), rng)
    sub = st.builds(
        lambda s, r, p, off, at: Call(
            "max_over_time", (Subquery(Call("rate", (s,)), r, p, off, at),)
        ),
        rng, _dur_ms, _dur_ms, st.sampled_from([0, 3_600_000]),
        st.one_of(st.none(), _at_ms),
    )
    agg = st.builds(
        lambda op, e, names, which: Agg(
            op, e,
            None,
            by=tuple(names) if which else None,
            without=None if which else tuple(names),
        ),
        st.sampled_from(["sum", "avg", "min", "max", "count"]),
        inner,
        st.lists(_label, max_size=2),
        st.booleans(),
    )
    topk = st.builds(lambda k, e: Agg("topk", e, Number(float(k))),
                     st.integers(1, 5), inner)
    limitk = st.builds(
        lambda op, k, e: Agg(op, e, Number(float(k))),
        st.sampled_from(["limitk", "limit_ratio"]),
        st.integers(1, 5), inner,
    )

    @st.composite
    def binop(draw):
        op = draw(st.sampled_from(
            ["+", "-", "*", "/", "%", "^", "==", ">", "<",
             "and", "or", "unless"]))
        is_cmp = op in ("==", ">", "<")
        is_set = op in ("and", "or", "unless")
        match = draw(st.one_of(
            st.none(),
            st.tuples(st.sampled_from(["on", "ignoring"]),
                      st.lists(_label, max_size=2).map(tuple)),
        ))
        group = None
        if not is_set and match is not None and draw(st.booleans()):
            extras = tuple(
                e for e in draw(st.lists(_label, max_size=2))
                if not (match[0] == "on" and e in match[1])
            )
            group = (draw(st.sampled_from(["left", "right"])), extras)
        return BinOp(
            op, draw(inner), draw(inner),
            bool_mode=is_cmp and draw(st.booleans()),
            match=match, group=group,
        )

    return st.one_of(
        instant, unary, call1, rate, sub, agg, topk, limitk, binop()
    )


_ast = st.recursive(
    st.one_of(_selector(with_range=False), st.builds(Number, _num)),
    _exprs,
    max_leaves=6,
)


@given(_ast)
@settings(max_examples=200, deadline=None)
def test_parse_format_parse_is_identity(ast):
    text = format_expr(ast)
    assert parse(text) == ast, text


def _ref_pinned(node, under_pinned=False):
    """Independent reference for 'fully pinned under range semantics':
    ≥1 selector/subquery, each carrying @ (directly or via an
    enclosing pinned subquery), and no time() call anywhere."""
    if isinstance(node, Selector):
        return [node.at_ms is not None or under_pinned]
    if isinstance(node, Subquery):
        mine = node.at_ms is not None or under_pinned
        return [mine] + _ref_pinned(node.expr, mine)
    if isinstance(node, Call):
        flags = [] if node.func != "time" else [False]
        for a in node.args:
            flags += _ref_pinned(a, under_pinned)
        return flags
    if isinstance(node, Agg):
        flags = _ref_pinned(node.expr, under_pinned)
        if node.param is not None:
            flags += _ref_pinned(node.param, under_pinned)
        return flags
    if isinstance(node, BinOp):
        return (_ref_pinned(node.lhs, under_pinned)
                + _ref_pinned(node.rhs, under_pinned))
    if isinstance(node, Unary):
        return _ref_pinned(node.expr, under_pinned)
    return []


@given(_ast, st.integers(0, 10**9), st.integers(0, 10**9))
@settings(max_examples=200, deadline=None)
def test_resolve_range_at_fuzz(ast, start_ms, span):
    """Range-mode @ resolution over random ASTs: every start/end
    anchor becomes the numeric range bound, numeric anchors and all
    other structure survive untouched (format_expr equality after the
    same textual substitution), and the pinned verdict agrees with an
    independent reference walk."""
    end_ms = start_ms + span
    out, pinned = _resolve_range_at(ast, start_ms, end_ms)

    def anchors(n):
        if isinstance(n, (Selector, Subquery)):
            got = [n.at_ms]
            if isinstance(n, Subquery):
                got += anchors(n.expr)
            return got
        if isinstance(n, Call):
            return [a for arg in n.args for a in anchors(arg)]
        if isinstance(n, Agg):
            got = anchors(n.expr)
            if n.param is not None:
                got += anchors(n.param)
            return got
        if isinstance(n, BinOp):
            return anchors(n.lhs) + anchors(n.rhs)
        if isinstance(n, Unary):
            return anchors(n.expr)
        return []

    before, after = anchors(ast), anchors(out)
    assert len(before) == len(after)
    for b, a in zip(before, after):
        if b == "start":
            assert a == start_ms
        elif b == "end":
            assert a == end_ms
        else:
            assert a == b  # numeric or None: untouched
    # nothing but anchors changed: formatting out equals formatting
    # the original with the textual anchor substitution applied
    assert format_expr(out) == format_expr(ast).replace(
        "@ start()", f"@ {start_ms / 1000!r}"
    ).replace("@ end()", f"@ {end_ms / 1000!r}")

    flags = _ref_pinned(ast)
    assert pinned == (bool(flags) and all(flags))
