"""Property-based tests (hypothesis) for operator invariants.

Each example batches its generated rows into ONE Spark job, and
max_examples stays small — the point is randomized coverage of invariants
(idempotence, bounds, symmetry) that example tables can miss, not
throughput."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abc xyz.!?\n")), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=12,
)


@given(texts)
@SET
def test_dup_ngram_char_fraction_bounded(spark, rows):
    """0 ≤ dup-ngram coverage ≤ 1 for ANY text (the defect class the
    interval-union fix removed was values > 1)."""
    from data_rivers_spark.operators import textstats as TX

    df = spark.createDataFrame(list(enumerate(rows)), "doc_id long, text string")
    vals = [
        r.dup_2gram_char_frac
        for r in TX.dup_ngram_char_fraction(df, "text", "doc_id", n=2).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals), vals


@given(texts)
@SET
def test_jaccard_words_bounds_symmetry_identity(spark, rows):
    from data_rivers_spark.operators.dedup import jaccard_words

    df = spark.createDataFrame(list(enumerate(rows)), "doc_id long, text string")
    pairs = df.alias("a").crossJoin(df.alias("b")).select(
        jaccard_words(F.col("a.text"), F.col("b.text")).alias("jab"),
        jaccard_words(F.col("b.text"), F.col("a.text")).alias("jba"),
        (F.col("a.doc_id") == F.col("b.doc_id")).alias("same"),
    )
    for r in pairs.collect():
        assert 0.0 <= r.jab <= 1.0
        assert abs(r.jab - r.jba) < 1e-12  # symmetric
        if r.same:
            assert r.jab == 1.0  # self-similarity (empty text defined as 1)


@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("0123456789ABC-")), max_size=20),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_parcel_standardization_idempotent(spark, raws):
    """standardize(standardize(x)) == standardize(x) for arbitrary junk —
    canonical forms must be fixed points, junk must stay rejected."""
    from data_rivers_spark.operators import transforms as TR

    df = spark.createDataFrame(list(enumerate(raws)), "id long, parc_id string")
    once = TR.standardize_parcel_numbers(df, "parc_id")
    twice = TR.standardize_parcel_numbers(once, "parc_id")
    a = {r.id: r.parc_id for r in once.collect()}
    b = {r.id: r.parc_id for r in twice.collect()}
    assert a == b
