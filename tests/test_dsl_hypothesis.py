"""Property-based DSL laws (hypothesis — the reference's parser is
combinator-generated; these pin the algebra of the reimplementation):

* expansion COUNT law: |expand| = product of hole cardinalities;
* range law: {a..b} expands to exactly the inclusive integer sequence;
* escape law: {{text}} always renders as the literal {text};
* literal identity: hole-free templates expand to themselves, for any
  text not containing braces;
* assignment round trip: name=a|b / name=lo..hi parse to the values the
  equivalent template expands to.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from fs_schema_validator_ray.dsl import expand, parse_assignment

_lit = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="{}$|:\\\n\r"
    ),
    min_size=0,
    max_size=12,
)
_word = st.text(alphabet="abcdefghij", min_size=1, max_size=6)


@settings(max_examples=120, deadline=None)
@given(_lit)
def test_literal_identity(s):
    assert list(expand(s)) == [s]


@settings(max_examples=120, deadline=None)
@given(_lit.filter(lambda s: len(s) >= 1))
def test_escape_law(s):
    # (empty {{}} is a parse error — reference-grammar parity)
    assert list(expand("{{" + s + "}}")) == ["{" + s + "}"]


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=-20, max_value=20),
    st.integers(min_value=0, max_value=15),
)
def test_range_law(lo, width):
    hi = lo + width
    got = list(expand(f"{{{lo}..{hi}}}"))
    assert got == [str(v) for v in range(lo, hi + 1)]


@settings(max_examples=120, deadline=None)
@given(
    st.lists(_word, min_size=1, max_size=4, unique=True),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=4),
)
def test_expansion_count_law(variants, lo, width):
    hi = lo + width
    t = "x{" + "|".join(variants) + "}y{" + f"{lo}..{hi}" + "}z"
    got = list(expand(t))
    # enum variants expand SORTED (reference Enum semantics)
    assert len(got) == len(variants) * (width + 1)
    assert got == [
        f"x{v}y{n}z" for v in sorted(variants) for n in range(lo, hi + 1)
    ]


@settings(max_examples=120, deadline=None)
@given(st.lists(_word, min_size=1, max_size=4, unique=True))
def test_assignment_enum_round_trip(variants):
    name, value = parse_assignment("name=" + "|".join(variants))
    assert name == "name"
    # binding the assignment and expanding {$name} yields the sorted
    # variants — the CLI -b path's observable contract
    got = list(expand("{$name}", {"name": value}))
    assert got == sorted(variants)
