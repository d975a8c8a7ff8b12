"""Golden tests for the template/expression DSL.

Behavioral parity targets are the reference's evaluator tests
(`/root/reference/tests/evaluator/`): same inputs, same expansions /
errors, re-expressed against our own AST types.
"""

import pytest

from fs_schema_validator_ray.dsl import (
    BoolExpr,
    Choice,
    CoercionError,
    DslParseError,
    Hole,
    Lit,
    Op,
    Span,
    UnboundSymbolError,
    Var,
    evaluate,
    expand,
    parse_assignment,
    parse_expression,
    parse_template,
)


# --- parser (reference tests/evaluator/test_parser.py) ---------------------


def test_template():
    assert parse_template("foo-{bar|baz}-{0..10}.jpg") == [
        Lit("foo-"),
        Hole(Choice(("bar", "baz"))),
        Lit("-"),
        Hole(Span(0, 10)),
        Lit(".jpg"),
    ]


def test_double_braces_are_literals():
    assert parse_template("foo-{{6}}") == [Lit("foo-"), Lit("{6}")]


def test_empty_string():
    assert parse_template("") == [Lit("")]


@pytest.mark.parametrize(
    ("tpl", "variants"),
    [
        ("{foo}", ("foo",)),
        ("{+}", ("+",)),
        ("{-}", ("-",)),
        ("{_}", ("_",)),
        ("{foo|bar}", ("bar", "foo")),
        ("{ foo | bar }", ("bar", "foo")),
        ("{foo2}", ("foo2",)),
        ("{foo|}", ("", "foo")),
        ("{ foo | }", ("", "foo")),
        ("{ | }", ("",)),
        ("{|}", ("",)),
        ("{}", ("",)),
        ("{20..}", ("20..",)),
        ("{..30}", ("..30",)),
    ],
)
def test_enum_forms(tpl, variants):
    assert parse_template(tpl) == [Hole(Choice(variants))]


def test_enum_with_format():
    assert parse_template("{foo:>5}") == [Hole(Choice(("foo",)), fmt=">5")]


def test_range():
    assert parse_template("{0..10}") == [Hole(Span(0, 10))]
    assert parse_template("{20..100}") == [Hole(Span(20, 100))]
    assert parse_template("{-4..100}") == [Hole(Span(-4, 100))]


def test_range_with_format():
    assert parse_template("{0..10:02}") == [Hole(Span(0, 10), fmt="02")]
    assert parse_template("{20..100:x}") == [Hole(Span(20, 100), fmt="x")]


def test_binding():
    assert parse_template("{$foo}") == [Hole(Var("foo"))]
    assert parse_template("{$foo:02}") == [Hole(Var("foo"), fmt="02")]


def test_binding_fail():
    with pytest.raises(DslParseError):
        parse_template("{$0}")
    with pytest.raises(DslParseError):
        parse_template("{$-}")


def test_unbalanced_braces_fail():
    with pytest.raises(DslParseError):
        parse_template("{a}}")
    with pytest.raises(DslParseError):
        parse_template("}x")
    with pytest.raises(DslParseError):
        parse_template("{a")


def test_boolean_expression():
    assert parse_expression("$foo == bar") == BoolExpr(Var("foo"), Op.EQ, Lit("bar"))
    assert parse_expression("$foo==bar") == BoolExpr(Var("foo"), Op.EQ, Lit("bar"))
    assert parse_expression("$foo != bar") == BoolExpr(Var("foo"), Op.NEQ, Lit("bar"))
    assert parse_expression("$foo!=bar") == BoolExpr(Var("foo"), Op.NEQ, Lit("bar"))


def test_assignment():
    assert parse_assignment("foo=0..1") == ("foo", Span(0, 1))
    assert parse_assignment("foo=bar|baz") == ("foo", Choice(("bar", "baz")))
    assert parse_assignment("foo=.393123j") == ("foo", Choice((".393123j",)))
    assert parse_assignment("foo=1234") == ("foo", Choice(("1234",)))
    assert parse_assignment("foo=") == ("foo", Choice(("",)))
    with pytest.raises(DslParseError):
        parse_assignment("foo")
    with pytest.raises(DslParseError):
        parse_assignment("foo={}")


# --- expansion (reference tests/evaluator/test_expander.py) ----------------


def test_expand_without_placeholders():
    assert set(expand("foo")) == {"foo"}


def test_expand_enum():
    assert set(expand("foo-{bar}")) == {"foo-bar"}
    assert set(expand("foo-{bar|baz}")) == {"foo-bar", "foo-baz"}
    assert set(expand("foo-{0|2|4}")) == {"foo-0", "foo-2", "foo-4"}


def test_expand_escaping():
    assert set(expand("foo-{{6}}")) == {"foo-{6}"}


def test_expand_range():
    assert set(expand("foo-{0..5}")) == {f"foo-{i}" for i in range(6)}


def test_expand_product():
    assert set(expand("foo-{bar|baz}-{0..2}.jpg")) == {
        f"foo-{s}-{i}.jpg" for s in ("bar", "baz") for i in range(3)
    }


def test_expand_bindings():
    got = set(
        expand(
            "foo-{$foo}-{$bar}.jpg",
            {"foo": Choice(("bar", "baz")), "bar": Span(0, 2)},
        )
    )
    assert got == {f"foo-{s}-{i}.jpg" for s in ("bar", "baz") for i in range(3)}


def test_expand_unbound_raises():
    with pytest.raises(UnboundSymbolError):
        list(expand("foo-{$foo}.jpg"))


def test_expand_leave_unbound():
    assert set(expand("{foo|bar}-{$baz:02}.jpg", leave_unbound_vars_in=True)) == {
        "foo-{$baz:02}.jpg",
        "bar-{$baz:02}.jpg",
    }


def test_expand_formats():
    assert list(expand("{0..3:02}")) == ["00", "01", "02", "03"]
    assert list(expand("{10..12:x}")) == ["a", "b", "c"]
    assert list(expand("{foo:>5}")) == ["  foo"]


# --- evaluation (reference tests/evaluator/test_expression.py) -------------


def test_evaluate():
    assert evaluate("$foo == bar", {"foo": Lit("bar")}) is True
    assert evaluate("$foo == bar", {"foo": Lit("foo")}) is False
    assert evaluate("$foo != bar", {"foo": Lit("bar")}) is False
    assert evaluate("$foo != bar", {"foo": Lit("foo")}) is True
    assert evaluate("$foo != bar", {"foo": Choice(("bar",))}) is False
    assert evaluate("$foo != bar", {"foo": Choice(("foo",))}) is True


def test_evaluate_errors():
    with pytest.raises(UnboundSymbolError):
        evaluate("$foo == bar")
    with pytest.raises(CoercionError):
        evaluate("$foo == bar", {"foo": Span(1, 10)})
    with pytest.raises(CoercionError):
        evaluate("$foo == bar", {"foo": Choice(("foo", "bar"))})


# --- str round-trip (reference tests/evaluator/test_values.py) -------------


def test_hole_str():
    assert str(Hole(Span(0, 10), fmt="foo")) == "{0..10:foo}"
    assert str(Hole(Var("foo"), fmt="bar")) == "{$foo:bar}"
    assert str(Hole(Choice(("foo", "bar")), fmt="baz")) == "{bar|foo:baz}"
