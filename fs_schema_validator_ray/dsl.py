"""Template / expression DSL for rule specs.

From-scratch reimplementation (plain ``re`` + dataclasses, no parser
combinator dependency) of the binding-expansion language used by the
reference's schema compiler:

* grammar: ``/root/reference/fs_schema_validator/evaluator/parser.py:25-46``
* value semantics: ``/root/reference/fs_schema_validator/evaluator/values.py``

The language, in one line: a template string is a sequence of literal
fragments and ``{...}`` holes; a hole contains a binding (``{$var}``), an
inclusive integer range (``{0..10}``) or a choice/enum (``{a|b|c}``), each
with an optional Python format spec (``{0..10:02}``); ``{{text}}`` escapes
to the literal ``{text}``. Expansion yields the cartesian product of all
hole expansions joined with the literals. Expressions are
``$var == literal`` / ``$var != literal``. Assignments (CLI ``-b``) are
``name=0..5`` / ``name=a|b`` / ``name=value``.

All of this runs **driver-side only** (rule-plan compilation); nothing here
touches the data plane.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field
from itertools import product
from typing import Union


class DslParseError(ValueError):
    """Input does not conform to the template/expression grammar."""


class UnboundSymbolError(ValueError):
    """A ``$binding`` has no value (reference ``evaluator/errors.py:1``)."""


class CoercionError(ValueError):
    """A binding value cannot be coerced to a single string
    (reference ``evaluator/errors.py:5``)."""


# symbol: a letter followed by at least one more word-ish char
# (reference grammar ``parser.py:26``)
_SYMBOL_RE = re.compile(r"[A-Za-z][A-Za-z0-9_-]+")
_RANGE_RE = re.compile(r"\s*([-+]?\d+)\s*\.\.\s*([-+]?\d+)\s*\Z")
_EXPR_RE = re.compile(r"\s*\$([A-Za-z][A-Za-z0-9_-]+)\s*(==|!=)\s*(.*)\Z", re.S)
_ASSIGN_RE = re.compile(r"\s*([A-Za-z][A-Za-z0-9_-]+)\s*=(.*)\Z", re.S)


def _apply_format(value: object, fmt: str | None) -> str:
    if fmt is None:
        return f"{value}"
    return ("{0:" + fmt + "}").format(value)


@dataclass(frozen=True)
class Lit:
    """A literal fragment; doubles as the String binding value."""

    text: str

    def expand(
        self, bindings: "Bindings", leave_unbound: bool = False, fmt: str | None = None
    ) -> Iterator[str]:
        yield _apply_format(self.text, fmt) if fmt else self.text

    def coerce_to_string(self) -> "Lit":
        return self

    def __str__(self) -> str:
        return self.text


@dataclass(frozen=True)
class Choice:
    """An enum of string variants, kept sorted + deduplicated so expansion
    order is deterministic (reference ``values.py:59-86`` uses a SortedSet)."""

    variants: tuple[str, ...]

    def __init__(self, variants) -> None:
        object.__setattr__(self, "variants", tuple(sorted(set(variants))))

    def expand(
        self, bindings: "Bindings", leave_unbound: bool = False, fmt: str | None = None
    ) -> Iterator[str]:
        return (_apply_format(v, fmt) for v in self.variants)

    def coerce_to_string(self) -> Lit:
        if len(self.variants) == 1:
            return Lit(self.variants[0])
        raise CoercionError(f"cannot coerce enum {{{self}}} into a single string: variants > 1")

    def __str__(self) -> str:
        return "|".join(self.variants)


@dataclass(frozen=True)
class Span:
    """An inclusive integer range (reference ``values.py:89-106``)."""

    lo: int
    hi: int

    def expand(
        self, bindings: "Bindings", leave_unbound: bool = False, fmt: str | None = None
    ) -> Iterator[str]:
        return (_apply_format(n, fmt) for n in range(self.lo, self.hi + 1))

    def coerce_to_string(self) -> Lit:
        raise CoercionError(f"cannot coerce range {{{self}}} into a string")

    def __str__(self) -> str:
        return f"{self.lo}..{self.hi}"


@dataclass(frozen=True)
class Var:
    """A ``$name`` reference into the bindings dict (reference ``values.py:34-56``)."""

    name: str

    def _lookup(self, bindings: "Bindings") -> "BindingValue":
        try:
            return bindings[self.name]
        except KeyError as ex:
            raise UnboundSymbolError(f"no value provided for binding `{self.name}`") from ex

    def expand(
        self, bindings: "Bindings", leave_unbound: bool = False, fmt: str | None = None
    ) -> Iterator[str]:
        return self._lookup(bindings).expand(bindings, leave_unbound, fmt)

    def eval(self, bindings: "Bindings") -> "BindingValue":
        return self._lookup(bindings)

    def __str__(self) -> str:
        return f"${self.name}"


@dataclass(frozen=True)
class Hole:
    """A ``{...}`` element of a template: an inner value + optional format.

    Two-stage binding contract (reference ``values.py:109-131``): expanding
    with ``leave_unbound=True`` re-emits an unbound hole literally
    (``{$var:fmt}``) so a later expansion pass — e.g. a rule's inner
    bindings — can resolve it.
    """

    value: Union[Var, Span, Choice]
    fmt: str | None = None

    def expand(self, bindings: "Bindings", leave_unbound: bool = False) -> Iterator[str]:
        try:
            return self.value.expand(bindings, leave_unbound, self.fmt)
        except UnboundSymbolError:
            if not leave_unbound:
                raise
            return iter([str(self)])

    def __str__(self) -> str:
        if self.fmt is None:
            return f"{{{self.value}}}"
        return f"{{{self.value}:{self.fmt}}}"


BindingValue = Union[Lit, Choice, Span]
Bindings = dict[str, BindingValue]
Template = list  # list[Lit | Hole]
Assignment = tuple  # (name, BindingValue)


class Op:
    EQ = "=="
    NEQ = "!="


@dataclass(frozen=True)
class BoolExpr:
    """``$var == literal`` / ``$var != literal`` (reference ``values.py:153-168``)."""

    left: Var
    op: str
    right: Lit

    def eval(self, bindings: Bindings) -> bool:
        left = self.left.eval(bindings).coerce_to_string()
        if self.op == Op.EQ:
            return left == self.right
        return left != self.right


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

_HOLE_FORBIDDEN = set("${}")


def _parse_hole_body(body: str) -> Hole:
    """Parse the inside of ``{...}``. Dispatch order mirrors the reference
    grammar alternative ``binding | range | enum`` (``parser.py:34``)."""
    head, sep, fmt = body.partition(":")
    if sep:
        fmt = fmt.strip()
        if not fmt or "{" in fmt or "}" in fmt:
            raise DslParseError(f"invalid format spec in hole {{{body}}}")
    else:
        fmt = None

    stripped = head.strip()
    if stripped.startswith("$"):
        name = stripped[1:].strip()
        if not _SYMBOL_RE.fullmatch(name):
            raise DslParseError(f"invalid binding name in hole {{{body}}}")
        return Hole(Var(name), fmt)

    m = _RANGE_RE.fullmatch(head)
    if m:
        return Hole(Span(int(m.group(1)), int(m.group(2))), fmt)

    if "$" in head:
        raise DslParseError(f"`$` not allowed inside enum variants: {{{body}}}")
    variants = [part.strip() for part in head.split("|")]
    return Hole(Choice(variants), fmt)


def parse_template(s: str) -> Template:
    """Parse a template string into ``[Lit | Hole]`` elements.

    Golden behaviors pinned by the reference's parser tests
    (``/root/reference/tests/evaluator/test_parser.py``): ``""`` parses to a
    single empty literal; ``{}``/``{|}``/``{20..}`` degenerate to enums;
    ``{{6}}`` escapes to the literal ``{6}``; ``{$0}`` is an error.
    """
    if s == "":
        return [Lit("")]

    out: Template = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c not in "{}":
            j = i
            while j < n and s[j] not in "{}":
                j += 1
            out.append(Lit(s[i:j]))
            i = j
            continue
        if c == "}":
            raise DslParseError(f"unbalanced `}}` at offset {i} in template {s!r}")
        # at '{' — try a simple hole first: '{' body-without-braces '}'
        j = i + 1
        while j < n and s[j] not in "{}":
            j += 1
        if j < n and s[j] == "}":
            out.append(_parse_hole_body(s[i + 1 : j]))
            i = j + 1
            continue
        # escaped hole: '{{' text '}}' -> literal '{text}'
        if s.startswith("{{", i):
            k = s.find("}}", i + 2)
            inner = s[i + 2 : k] if k != -1 else ""
            if k != -1 and inner and "{" not in inner and "}" not in inner:
                out.append(Lit("{" + inner + "}"))
                i = k + 2
                continue
        raise DslParseError(f"unbalanced `{{` at offset {i} in template {s!r}")
    return out


def parse_expression(s: str) -> BoolExpr:
    m = _EXPR_RE.fullmatch(s)
    if not m:
        raise DslParseError(f"cannot parse expression {s!r}")
    right = m.group(3).strip()
    if not right or "{" in right or "}" in right:
        raise DslParseError(f"invalid right-hand side in expression {s!r}")
    return BoolExpr(Var(m.group(1)), m.group(2), Lit(right))


def parse_assignment(s: str) -> Assignment:
    """Parse a CLI binding override ``name=value`` (reference
    ``parser.py:46``, used by ``__main__.py:15-22``). Bare values become
    single-variant enums; ``a|b`` becomes an enum; ``0..5`` a range."""
    m = _ASSIGN_RE.fullmatch(s)
    if not m:
        raise DslParseError(f"cannot parse assignment {s!r}")
    rest = m.group(2)
    if any(ch in rest for ch in "${}:"):
        raise DslParseError(f"invalid characters in assignment value {s!r}")
    rm = _RANGE_RE.fullmatch(rest)
    if rm:
        return (m.group(1), Span(int(rm.group(1)), int(rm.group(2))))
    return (m.group(1), Choice(part.strip() for part in rest.split("|")))


# ---------------------------------------------------------------------------
# public evaluation API (reference ``evaluator/__init__.py:8-28``)
# ---------------------------------------------------------------------------


def expand(
    s: str, bindings: Bindings | None = None, leave_unbound_vars_in: bool = False
) -> Iterator[str]:
    """Expand a template into the cartesian product of its hole expansions."""
    bindings = bindings or {}
    elements = parse_template(s)
    return (
        "".join(parts)
        for parts in product(*(el.expand(bindings, leave_unbound_vars_in) for el in elements))
    )


def evaluate(s: str, bindings: Bindings | None = None) -> bool:
    """Evaluate a boolean ``$var ==/!= literal`` expression."""
    return parse_expression(s).eval(bindings or {})
