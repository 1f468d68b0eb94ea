"""Label/signature semantics vs the reference's golden cases (FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monolith_spark.labels import (
    EQ,
    NEQ,
    NRE,
    RE,
    LabelMatcher,
    exact_signature_predicate,
    matcher_predicate,
    python_signature,
    signature_expr,
    superset_predicate,
)


def _labels_df(spark, rows):
    return spark.createDataFrame(
        [(r,) for r in rows], "labels map<string,string>"
    )


def test_g5_canonical_signature_sorted_by_key(spark):
    # G5 (/root/reference/src/indexer/sled_indexer.rs:196-205): labels
    # inserted out of order encode sorted by key, k=v joined with ','.
    # (The reference's leading 'L' is a sled key prefix, not identity.)
    df = _labels_df(
        spark, [{"test1": "test1value", "test3": "test1value", "test2": "test1value"}]
    )
    sig = df.select(signature_expr("labels").alias("s")).head()[0]
    assert sig == "test1=test1value,test2=test1value,test3=test1value"
    assert python_signature(
        {"test3": "test1value", "test1": "test1value", "test2": "test1value"}
    ) == sig


def test_signature_escaping_injective(spark):
    # SURVEY §7.4: the reference corrupts values containing ',' or '='
    # (src/indexer/sled_indexer.rs:291-319); our escaping must keep
    # distinct label sets distinct.
    a = {"k": "v1,k2=v2"}
    b = {"k": "v1", "k2": "v2"}
    df = _labels_df(spark, [a, b])
    sigs = [r[0] for r in df.select(signature_expr("labels")).collect()]
    assert len(set(sigs)) == 2
    assert python_signature(a) != python_signature(b)
    # Spark expression and Python twin agree on nasty inputs.
    nasty = {"a=b": "c\\d", "e,f": "=,\\"}
    df2 = _labels_df(spark, [nasty])
    assert df2.select(signature_expr("labels")).head()[0] == python_signature(nasty)


def test_superset_predicate_matches_reference_semantics(spark):
    # J4 (/root/reference/src/indexer/common.rs:13-21): series qualifies
    # iff labels ⊇ matchers. G1's canonical example.
    s1 = {"test1": "1", "test2": "2"}
    s2 = {"test2": "2", "test3": "3"}
    s3 = {"test1": "1", "test2": "2", "test3": "3"}
    df = _labels_df(spark, [s1, s2, s3])
    got = df.filter(superset_predicate("labels", {"test1": "1"})).count()
    assert got == 2  # series 1 and 3 (tests/test_chunk.rs:45-57)
    got2 = df.filter(superset_predicate("labels", {"test1": "1", "test2": "2"})).count()
    assert got2 == 2  # (tests/test_chunk.rs:59-67)
    # empty matcher set matches everything
    assert df.filter(superset_predicate("labels", {})).count() == 3


def test_exact_signature_predicate(spark):
    s1 = {"test1": "1", "test2": "2"}
    s3 = {"test1": "1", "test2": "2", "test3": "3"}
    df = _labels_df(spark, [s1, s3])
    assert df.filter(exact_signature_predicate("labels", s1)).count() == 1
    assert df.filter(exact_signature_predicate("labels", {"test1": "1"})).count() == 0


def test_matcher_types_prometheus_semantics(spark):
    df = _labels_df(spark, [{"job": "api", "env": "prod"}, {"job": "db"}, {"other": "x"}])
    # NEQ: absent label counts as not-equal (empty string)
    assert df.filter(matcher_predicate("labels", [LabelMatcher("env", "prod", NEQ)])).count() == 2
    assert df.filter(matcher_predicate("labels", [LabelMatcher("job", "api", EQ)])).count() == 1
    # RE fully anchored: 'a' must not match 'api'
    assert df.filter(matcher_predicate("labels", [LabelMatcher("job", "a", RE)])).count() == 0
    assert df.filter(matcher_predicate("labels", [LabelMatcher("job", "api|db", RE)])).count() == 2
    assert df.filter(matcher_predicate("labels", [LabelMatcher("job", ".+", NRE)])).count() == 1


def test_series_id_stable_under_key_order(spark):
    from monolith_spark.labels import series_id_expr

    df = _labels_df(spark, [{"a": "1", "b": "2"}, {"b": "2", "a": "1"}])
    ids = [r[0] for r in df.select(series_id_expr("labels")).collect()]
    assert ids[0] == ids[1]


def test_regex_literal_set_extraction():
    # Prometheus FastRegexMatcher "set matches": finite alternations
    # expand exactly; anything non-literal refuses.
    import re

    from monolith_spark.labels import regex_literal_set as rls

    exact = {
        "a|b|c": {"a", "b", "c"},
        "(?:j1|j2)": {"j1", "j2"},
        "prod": {"prod"},
        "a(b|c)(x|y)": {"abx", "aby", "acx", "acy"},
        r"a\.b": {"a.b"},
        "(a|(b|c))d": {"ad", "bd", "cd"},
        "a|": {"a", ""},
    }
    for pat, want in exact.items():
        got = rls(pat)
        assert got == want, (pat, got)
        for s in got:  # every expansion really fullmatches
            assert re.fullmatch(f"(?:{pat})", s)
    for pat in ["a.*", "a+", "a?", "a{2}", "[ab]", "a.b", "^a$",
                r"\d", "(?=a)b", "(?P<x>a)", "a\\", "(a", "a)b", "j.*|k"]:
        assert rls(pat) is None, pat
    assert rls("|".join(f"v{i}" for i in range(100))) is None  # cap
