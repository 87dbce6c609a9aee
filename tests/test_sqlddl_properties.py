"""Property-based hardening of the DDL parser's pure helpers
(hypothesis): the depth-aware comma splitter and the DEFAULT-literal
parser must round-trip arbitrary well-formed inputs and refuse the
rest loudly — a text front-end's failure mode must never be a silent
misparse."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from lakehouse.sqldml import SqlDmlError  # noqa: E402
from lakehouse.sqlddl import _parse_literal, _split_top_commas  # noqa: E402

# identifier-ish atoms and parenthesized type-ish atoms (no commas at
# top level inside an atom unless wrapped in parens)
_atom = st.one_of(
    st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True),
    st.from_regex(r"[a-z]{1,6}\(\d{1,2},\d{1,2}\)", fullmatch=True),
    st.from_regex(r"[a-z]{1,6}<[a-z]{1,6}>", fullmatch=True),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_atom, min_size=1, max_size=8))
def test_split_top_commas_roundtrip(parts):
    joined = ", ".join(parts)
    assert _split_top_commas(joined) == parts


@settings(max_examples=200, deadline=None)
@given(st.lists(_atom, min_size=2, max_size=5))
def test_split_ignores_commas_inside_parens(parts):
    # one item that CONTAINS a comma inside parens must stay whole
    wrapped = f"decimal({len(parts)},2)"
    items = [wrapped] + parts
    assert _split_top_commas(", ".join(items)) == items


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(10**15), max_value=10**15))
def test_parse_literal_ints(n):
    assert _parse_literal(str(n)) == n


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e12,
        max_value=1e12,
        allow_nan=False,
        allow_infinity=False,
    )
)
def test_parse_literal_floats(x):
    got = _parse_literal(repr(x))
    assert got == pytest.approx(x)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40))
def test_parse_literal_strings_roundtrip(s):
    quoted = "'" + s.replace("'", "''") + "'"
    assert _parse_literal(quoted) == s


@settings(max_examples=100, deadline=None)
@given(st.from_regex(r"[a-z_]{1,8}\s*[+*/-]\s*\d{1,4}", fullmatch=True))
def test_parse_literal_refuses_expressions(expr):
    if expr.strip().upper() in ("TRUE", "FALSE"):
        return
    with pytest.raises(SqlDmlError):
        _parse_literal(expr)
