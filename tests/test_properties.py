"""Hypothesis property tests for the pure-Python kernels (no Spark —
these run in milliseconds and hammer the logic the DataFrame plans are
built on)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from elephant_twin_spark.plans import expr as E
from elephant_twin_spark.streaming.stateful import _sessions


# ------------------------------------------------------------ sessionize

@given(
    ts=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
    gap=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=200)
def test_sessions_partition_and_gap_invariants(ts, gap):
    ts = sorted(ts)
    runs = _sessions(ts, gap)
    # partition: counts sum to the input length, bounds nest and are ordered
    assert sum(n for _, _, n in runs) == len(ts)
    flat_idx = 0
    prev_end = None
    for start, end, n in runs:
        chunk = ts[flat_idx : flat_idx + n]
        assert chunk[0] == start and chunk[-1] == end
        # within a run every consecutive gap <= gap
        assert all(b - a <= gap for a, b in zip(chunk, chunk[1:]))
        # between runs the gap is > gap
        if prev_end is not None:
            assert start - prev_end > gap
        prev_end = end
        flat_idx += n


# --------------------------------------------------------- predicate IR

_names = st.sampled_from(["a", "b", "event_type", "user_id"])
_values = st.one_of(
    st.text(alphabet="xyz_0 9", min_size=0, max_size=8),
    st.integers(min_value=-10**6, max_value=10**6),
)


def _exprs(depth=3):
    leaf = st.builds(E.Eq, _names, _values)
    return st.recursive(
        leaf,
        lambda children: st.one_of(
            st.builds(E.And, children, children),
            st.builds(E.Or, children, children),
        ),
        max_leaves=8,
    )


@given(e=_exprs())
@settings(max_examples=200)
def test_expr_json_roundtrip(e):
    assert repr(E.from_json_dict(E.to_json_dict(e))) == repr(e)


@given(e=_exprs())
@settings(max_examples=200)
def test_pushable_extraction_is_subset(e):
    # pushing against ALL columns returns the whole EQ/AND/OR tree;
    # against NO columns returns nothing
    assert E.extract_pushable(e, {"a", "b", "event_type", "user_id"}) is not None
    assert E.extract_pushable(e, set()) is None


@given(
    name=st.sampled_from(["a", "event_type"]),
    val=st.text(alphabet=st.characters(whitelist_categories=["Ll", "Nd"]), min_size=1, max_size=8),
)
@settings(max_examples=100)
def test_parse_predicate_roundtrips_eq(name, val):
    e = E.parse_predicate(f"{name} = '{val}'")
    assert isinstance(e, E.Eq) and e.column == name and e.value == val


# ------------------------------------------------------------ text query

@given(
    terms=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=["Ll"]), min_size=1, max_size=6),
        min_size=2,
        max_size=5,
    )
)
@settings(max_examples=100)
def test_phrase_parse(terms):
    from elephant_twin_spark.operators.text import parse_query, _Phrase, _Term

    node = parse_query('"' + " ".join(terms) + '"')
    if len(terms) == 1:
        assert isinstance(node, _Term)
    else:
        assert isinstance(node, _Phrase) and node.terms == terms


# ------------------------------------------------------------- intervals

from elephant_twin_spark.plans import intervals as iv

_ranges = st.lists(
    st.tuples(st.integers(0, 1000), st.integers(0, 1000)).map(
        lambda t: (min(t), max(t))
    ),
    max_size=20,
)


def _covered(ranges):
    out = set()
    for s, e in ranges:
        out |= set(range(s, e))
    return out


@given(a=_ranges, b=_ranges)
@settings(max_examples=200)
def test_interval_union_intersect_match_set_semantics(a, b):
    na, nb = iv.normalize(a), iv.normalize(b)
    # normalize: disjoint, sorted, same coverage
    assert _covered(na) == _covered(a)
    assert all(x[1] < y[0] for x, y in zip(na, na[1:]))

    assert _covered(iv.union(na, nb)) == _covered(a) | _covered(b)
    assert _covered(iv.intersect(na, nb)) == _covered(a) & _covered(b)
    assert iv.total_length(na) == len(_covered(a))


# --------------------------------------------------------- text query parse

_term_chars = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


@given(t=_term_chars)
@settings(max_examples=200)
def test_bare_term_never_misparses(t):
    from elephant_twin_spark.operators.text import parse_query, _Term

    node = parse_query(t)
    assert node == _Term(t)


@given(t=_term_chars, k=st.integers(min_value=0, max_value=4))
@settings(max_examples=100)
def test_fuzzy_and_prefix_forms_parse(t, k):
    from elephant_twin_spark.operators.text import (
        parse_query,
        _Fuzzy,
        _Prefix,
    )

    assert parse_query(f"{t}~{k}") == _Fuzzy(t, k)
    assert parse_query(f"{t}*") == _Prefix(t)


@given(ts=st.lists(_term_chars, min_size=2, max_size=5))
@settings(max_examples=100)
def test_boolean_combinations_parse_positive(ts):
    from elephant_twin_spark.operators.text import parse_query, _is_positive

    q_and = " AND ".join(ts)
    q_or = " OR ".join(ts)
    assert _is_positive(parse_query(q_and))
    assert _is_positive(parse_query(q_or))
    assert not _is_positive(parse_query(f"NOT {ts[0]}"))
    # NOT under AND with a positive sibling is servable
    assert _is_positive(parse_query(f"{ts[0]} AND NOT {ts[1]}"))


# --------------------------------------------------------- wildcard regex

@given(p=st.text(alphabet="ab*?", min_size=1, max_size=8), s=st.text(alphabet="ab", max_size=8))
@settings(max_examples=300)
def test_wildcard_regex_equals_fnmatch(p, s):
    import re
    import fnmatch

    from elephant_twin_spark.operators.text import _wildcard_regex

    got = re.fullmatch(_wildcard_regex(p)[1:-1], s) is not None
    # fnmatch with identical *, ? semantics (no [] classes in our inputs)
    assert got == fnmatch.fnmatchcase(s, p)
