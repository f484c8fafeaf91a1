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


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.lists(st.integers(min_value=0, max_value=63), max_size=3),
        ),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_simhash_blocking_recall_is_exact(spark, sigs_and_flips):
    """Pigeonhole guarantee of combination blocking: for ANY base signature
    and ANY ≤3 flipped bits, the (base, flipped) pair MUST appear in
    simhash_near_pairs — blocking may only add candidates, never lose a
    within-distance pair. This is the exactness the Manku-style scheme
    claims; a bug in block widths/offsets or key packing would break it."""
    from data_rivers_spark.operators import dedup as D

    rows = []
    expected = set()
    for i, (base, flip_bits) in enumerate(sigs_and_flips):
        a_id, b_id = 2 * i, 2 * i + 1
        flipped = base
        for b in set(flip_bits):
            flipped ^= 1 << b
        # int -> signed 64-bit long domain
        def s64(x):
            x &= (1 << 64) - 1
            return x - (1 << 64) if x >= 1 << 63 else x
        rows.append((a_id, s64(base)))
        rows.append((b_id, s64(flipped)))
        if s64(base) != s64(flipped):
            expected.add((a_id, b_id))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(df, "doc_id", max_hamming=3).collect()
    }
    # every planted within-distance pair recalled (other cross pairs may
    # legitimately also qualify if generated signatures happen to be close)
    missing = expected - got
    assert not missing, missing


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),     # user
            st.integers(min_value=0, max_value=100_000),  # seconds offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_funnel_stage_counts_monotone(spark, events):
    """An ordered funnel can only narrow: each stage's user count is ≤ the
    previous stage's, for ANY event stream."""
    import datetime

    from data_rivers_spark.plans.analytics_queries import conversion_funnel

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=s), t)
        for u, s, t in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage: r.n_users for r in
           conversion_funnel(df, ["view", "click", "purchase"]).collect()}
    assert out["view"] >= out["view>click"] >= out["view>click>purchase"]


@given(texts)
@SET
def test_duplicate_span_stats_invariants(spark, rows):
    """Span-dedup invariants: duplicated tokens never exceed the doc's
    tokens, counts are non-negative, grams >= spans (a span holds >= 1
    gram), and an exact duplicate pair marks (almost) everything — every
    doc of >= k tokens duplicated verbatim must report a dup span."""
    from data_rivers_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)] +
        [(1000 + i, t) for i, t in enumerate(rows)],  # verbatim copies
        ["doc_id", "text"],
    )
    out = duplicate_span_stats(df, "text", "doc_id", k=3).collect()
    assert len(out) == 2 * len(rows)
    for r in out:
        assert 0 <= r.dup_token_count <= r.n_tokens
        assert r.dup_span_count >= 0
        assert r.dup_gram_count >= r.dup_span_count or r.dup_span_count == 0
        if r.n_tokens >= 3:
            # its verbatim twin guarantees every 3-gram is cross-doc duplicated
            assert r.dup_token_count == r.n_tokens
            assert r.dup_span_count == 1


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"])),
        min_size=2, max_size=60, unique_by=lambda t: t[0],
    ),
    st.floats(0.0, 1.0),
)
@SET
def test_domain_mixture_sample_invariants(spark, rows, temp):
    """Mixture-sampling invariants at any temperature: output ⊆ input (no
    minting), per-row decisions deterministic under repartitioning, and
    every domain's kept count <= its input count."""
    from data_rivers_spark.operators.sampling import domain_mixture_sample

    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = domain_mixture_sample(df, "doc_id", "source", temp, 0.5, seed=2)
    got = {(r.doc_id, r.source) for r in out.collect()}
    assert got <= set(rows)
    again = {(r.doc_id, r.source) for r in
             domain_mixture_sample(df.repartition(5), "doc_id", "source",
                                   temp, 0.5, seed=2).collect()}
    assert got == again


@given(texts)
@SET
def test_bpe_round_conservation(spark, rows):
    """BPE pair-count conservation: total pair occurrences == Σ freq ·
    (len(word)-1) over the vocabulary, and applying the top merge strictly
    reduces (or preserves, when it never fires twice in a word) the total
    symbol count by exactly the merged pair's count."""
    from data_rivers_spark.operators.textstats import (
        bpe_apply_merge, bpe_pair_counts, word_frequency_table,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], ["doc_id", "text"])
    wf = word_frequency_table(df, "text").localCheckpoint()
    vocab = wf.collect()
    if not vocab:
        return
    pc = bpe_pair_counts(wf).collect()
    total_pairs = sum(r.pair_count for r in pc)
    assert total_pairs == sum(r.freq * max(len(r.word) - 1, 0) for r in vocab)
    if not pc:
        return
    top = pc[0]
    merged = bpe_apply_merge(wf, top.left, top.right)
    before = sum(r.freq * len(r.word) for r in vocab)
    after = sum(
        r.freq * len(r.symbols)
        for r in merged.select("word", "freq", "symbols").collect()
    )
    # every merge occurrence fuses two symbols into one; greedy
    # non-overlapping application can fire at most pair_count times and at
    # least once per word containing the pair
    assert before - after <= top.pair_count
    assert after < before


@given(texts, st.integers(1, 12))
@SET
def test_chunk_by_sentences_roundtrip(spark, rows, budget):
    """Sentence chunking invariants at any budget: concatenating a doc's
    chunks in order reproduces the concatenation of its extracted sentences
    (lossless modulo unmatched bare-terminator runs, which the segmentation
    regex deliberately drops), token totals equal the whitespace token
    count of the claimed text, and docs with no sentences emit nothing."""
    import re

    from data_rivers_spark.operators.chunking import (
        SENTENCE_PATTERN,
        chunk_by_sentences,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )
    out = chunk_by_sentences(df, "text", "doc_id", budget_tokens=budget).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(rows):
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        sents = re.findall(SENTENCE_PATTERN, t)
        if not sents:
            assert not got
            continue
        claimed = "".join(sents)
        assert "".join(r.chunk_text for r in got) == claimed
        assert all(r.n_sentences >= 1 for r in got)
        # token totals are PER-SENTENCE whitespace counts: a terminator
        # without trailing whitespace ('a?a') splits into two sentences
        # and thus two tokens, more than the whole-text split would give
        assert sum(r.n_tokens for r in got) == sum(len(s.split()) for s in sents)


@given(
    texts,
    st.lists(
        st.tuples(
            st.text(alphabet="abcxyz", min_size=1, max_size=2),
            st.text(alphabet="abcxyz", min_size=1, max_size=2),
        ),
        min_size=0,
        max_size=4,
    ),
)
@SET
def test_bpe_encode_lossless_and_conserving(spark, rows, merges):
    """For ANY corpus and ANY merge list: (1) concatenating a document's
    tokens reproduces its whitespace-split words exactly (BPE merges only
    ever JOIN adjacent symbols — encoding is lossless), and (2) the token
    count never exceeds the character count nor drops below the word
    count."""
    from data_rivers_spark.operators.dedup import words as words_expr
    from data_rivers_spark.operators.textstats import bpe_encode

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )
    enc = {r.doc_id: r for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    ws = {
        r.doc_id: r.ws
        for r in df.select("doc_id", words_expr(F.col("text")).alias("ws")).collect()
    }
    for i, t in enumerate(rows):
        doc_words = [w for w in ws[i] if w is not None]
        if not doc_words:
            assert i not in enc
            continue
        r = enc[i]
        assert "".join(r.tokens) == "".join(doc_words)
        assert r.n_tokens == len(r.tokens)
        assert len(doc_words) <= r.n_tokens <= sum(len(w) for w in doc_words)
