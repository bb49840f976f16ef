"""Property-based tests (hypothesis) for the pure layers: type
validation/coercion, timestamp roundtrips, split_range invariants, and
parser/resolver robustness. No SparkSession needed — these run in ms."""

from hypothesis import given, settings
from hypothesis import strategies as st

from opentick_spark.engine import split_range
from opentick_spark.errors import OpentickError
from opentick_spark.typesys import (
    NS_PER_SEC,
    from_epoch_nanos,
    to_epoch_nanos,
    validate_value,
)

ints = st.integers(min_value=-(2**62), max_value=2**62)


@given(ints)
def test_int_clamp_saturates(v):
    for t, lo, hi in [
        ("tinyint", -128, 127),
        ("smallint", -32768, 32767),
        ("int", -(2**31), 2**31 - 1),
    ]:
        out = validate_value(v, t)
        assert lo <= out <= hi
        if lo <= v <= hi:
            assert out == v
        else:
            assert out == (lo if v < lo else hi)


@given(ints)
def test_bigint_passthrough(v):
    assert validate_value(v, "bigint") == v


@given(st.integers(min_value=0, max_value=2**53), st.integers(0, NS_PER_SEC - 1))
def test_timestamp_pair_roundtrip(sec, nsec):
    nanos = to_epoch_nanos([sec, nsec])
    assert nanos == sec * NS_PER_SEC + nsec
    assert from_epoch_nanos(nanos) == (sec, nsec)


@given(st.booleans())
def test_bool_not_an_int(b):
    try:
        validate_value(b, "int")
        raise AssertionError("bool accepted as int")
    except OpentickError:
        pass
    assert validate_value(b, "boolean") is b


@given(
    st.integers(-(2**40), 2**40),
    st.integers(1, 2**41),
    st.integers(2, 64),
)
def test_split_range_invariants(a, width, n):
    b = a + width
    parts = split_range(a, b, n)
    assert len(parts) == n
    # covers [a, b] exactly, adjacent bounds shared, monotone
    assert parts[0][0] == a and parts[-1][1] == b
    for (lo1, hi1), (lo2, _) in zip(parts, parts[1:]):
        assert hi1 == lo2
        assert lo1 <= hi1


@settings(max_examples=200)
@given(st.text(max_size=80))
def test_parser_never_crashes(sql):
    """Arbitrary input either parses or raises OpentickError — never an
    unhandled exception (parser.go's participle grammar rejects cleanly)."""
    from opentick_spark.dialect.parser import parse

    try:
        parse(sql)
    except OpentickError:
        pass
