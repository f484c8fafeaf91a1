"""Property-based tests (hypothesis) for the string-shaping operators.

The reference has no property tests (SURVEY §5); these pin invariants that
golden fixtures can't cover exhaustively. Strategy: generate inputs in
Python, run them through the Spark operators in one batch per example set
(collected via a shared session), and check invariants row-wise."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_rivers_spark.functions.text import camel_to_snake_case
from data_rivers_spark.operators import transforms as X

SLOW = settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_camel_to_snake_properties(s):
    out = camel_to_snake_case(s)
    # idempotent and lowercase
    assert camel_to_snake_case(out) == out
    assert out == out.lower()


PHONES = st.lists(
    st.sampled_from(list("0123456789-.,+() ")), min_size=10, max_size=20
).map("".join).filter(lambda s: len(re.sub(r"[^0-9]", "", s)) >= 10)


@SLOW
@given(st.lists(PHONES, min_size=1, max_size=20, unique=True))
def test_phone_format_properties(spark, phones):
    df = spark.createDataFrame([(p,) for p in phones], "phone string")
    out = [r.phone for r in X.reformat_phone_numbers(df, "phone").collect()]
    for raw, got in zip(phones, out):
        digits = re.sub(r"[^0-9]", "", raw)
        # shape: +CC (AAA) XXX-XXXX, last 10 digits preserved in order
        assert re.fullmatch(r"\+\d+ \(\d{3}\) \d{3}-\d{4}", got), (raw, got)
        assert re.sub(r"[^0-9]", "", got)[-10:] == digits[-10:]


PARCELS = st.one_of(
    st.from_regex(r"[0-9]{1,4}-[A-Z]-[0-9]{1,5}", fullmatch=True),
    st.from_regex(r"[0-9]{4}[A-Z][0-9]{5}[0-9A-Z]{4}[0-9A-Z]{2}", fullmatch=True),
    st.text(min_size=0, max_size=20),
)


@SLOW
@given(st.lists(PARCELS, min_size=1, max_size=30, unique=True))
def test_parcel_standardization_properties(spark, parcels):
    df = spark.createDataFrame([(p,) for p in parcels], "parc string")
    out = [r.parc for r in X.standardize_parcel_numbers(df, "parc").collect()]
    for got in out:
        # output is either a sentinel or a canonical 16-char parcel with >2
        # distinct chars and no hyphens
        assert got in ("invalid input", "invalid_input") or (
            len(got) == 16 and "-" not in got and len(set(got)) > 2
        ), got
