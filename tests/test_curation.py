"""Unit tests for operators/chunking.py and operators/textnorm.py."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from data_rivers_spark.operators.chunking import chunk_and_pack, chunk_documents
from data_rivers_spark.operators.textnorm import (
    nfc_normalize_text,
    remove_repeated_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunkDocuments:
    def test_single_chunk_when_short(self, spark):
        df = _docs(spark, [(1, "a b c")])
        out = chunk_documents(df, "text", "doc_id", 8, 2).collect()
        assert len(out) == 1
        assert out[0].chunk_idx == 0
        assert out[0].chunk_text == "a b c"
        assert out[0].n_chunk_tokens == 3

    def test_windows_and_overlap(self, spark):
        # 10 tokens, chunk=4, overlap=2 -> step 2 -> starts 0,2,4,6 (4 chunks)
        toks = [f"t{i}" for i in range(10)]
        df = _docs(spark, [(1, " ".join(toks))])
        out = sorted(
            chunk_documents(df, "text", "doc_id", 4, 2).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
        assert out[0].chunk_text == "t0 t1 t2 t3"
        assert out[1].chunk_text == "t2 t3 t4 t5"
        assert out[3].chunk_text == "t6 t7 t8 t9"
        # consecutive chunks overlap by exactly overlap_tokens
        assert out[0].chunk_text.split()[-2:] == out[1].chunk_text.split()[:2]

    def test_every_token_covered(self, spark):
        toks = [f"w{i}" for i in range(13)]  # 13 = not a multiple of step
        df = _docs(spark, [(1, " ".join(toks))])
        out = chunk_documents(df, "text", "doc_id", 5, 1).collect()
        covered = set()
        for r in out:
            covered.update(r.chunk_text.split())
        assert covered == set(toks)
        # last chunk may be short but never empty
        assert all(r.n_chunk_tokens > 0 for r in out)

    def test_empty_doc_emits_nothing(self, spark):
        df = _docs(spark, [(1, ""), (2, "  \n "), (3, "x y")])
        out = chunk_documents(df, "text", "doc_id", 4, 1).collect()
        assert {r.doc_id for r in out} == {3}

    def test_overlap_must_be_smaller(self, spark):
        df = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "doc_id", 4, 4)

    def test_carry_cols(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f", "web")], ["doc_id", "text", "source"]
        )
        out = chunk_documents(
            df, "text", "doc_id", 4, 1, carry_cols=("source",)
        ).collect()
        assert all(r.source == "web" for r in out)


class TestChunkAndPack:
    def test_sequences_respect_budget_starts(self, spark):
        df = _docs(spark, [(i, " ".join(["x"] * 10)) for i in range(8)])
        out = chunk_and_pack(
            df, "text", "doc_id", chunk_tokens=10, overlap_tokens=0,
            pack_budget=25,
        ).collect()
        # within a shard, seq_id = floor(start/budget): running totals of
        # 10-token chunks -> starts 0,10,20,30,... -> seqs 0,0,0,1,...
        by_shard: dict = {}
        for r in sorted(out, key=lambda r: (r.shard, r.doc_id, r.chunk_idx)):
            start = by_shard.get(r.shard, 0)
            assert r.seq_id == start // 25
            by_shard[r.shard] = start + r.n_chunk_tokens

    def test_explicit_shard_col(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", 0), (2, "d e f", 1)], ["doc_id", "text", "shard"]
        )
        out = chunk_and_pack(
            df, "text", "doc_id", 4, 1, 8, shard_col="shard"
        ).collect()
        assert {(r.doc_id, r.shard) for r in out} == {(1, 0), (2, 1)}


class TestNfcNormalize:
    def test_nfd_composes(self, spark):
        nfd = "cafe" + chr(769)  # 'cafe' + combining acute
        df = _docs(spark, [(1, nfd), (2, "café"), (3, None)])
        out = {r.doc_id: r.text for r in nfc_normalize_text(df, "text").collect()}
        assert out[1] == "café"
        assert len(out[1]) == 4
        assert out[2] == "café"  # already NFC: unchanged
        assert out[3] is None  # NULL passes through
        assert unicodedata.is_normalized("NFC", out[1])

    def test_out_col(self, spark):
        df = _docs(spark, [(1, "plain")])
        row = nfc_normalize_text(df, "text", out_col="norm").collect()[0]
        assert row.text == row.norm == "plain"


class TestRemoveRepeatedLines:
    def test_first_occurrence_order(self, spark):
        df = _docs(spark, [(1, "a\nb\na\nc\nb\na")])
        row = remove_repeated_lines(df, "text", out_col="clean").collect()[0]
        assert row.clean == "a\nb\nc"

    def test_no_repeats_is_identity(self, spark):
        df = _docs(spark, [(1, "x\ny\nz"), (2, "single")])
        out = {r.doc_id: r.text for r in remove_repeated_lines(df, "text").collect()}
        assert out[1] == "x\ny\nz"
        assert out[2] == "single"

    def test_whole_doc_duplicated(self, spark):
        df = _docs(spark, [(1, "p\nq")])
        aug = df.select(
            "doc_id", F.concat("text", F.lit("\n"), "text").alias("text")
        )
        row = remove_repeated_lines(aug, "text").collect()[0]
        assert row.text == "p\nq"


class TestChunkBySentences:
    def test_never_splits_sentences(self, spark):
        from data_rivers_spark.operators.chunking import chunk_by_sentences

        text = "one two three. four five six! seven eight nine? ten"
        df = _docs(spark, [(1, text)])
        out = sorted(
            chunk_by_sentences(df, "text", "doc_id", budget_tokens=5).collect(),
            key=lambda r: r.chunk_idx,
        )
        # 4 sentences of 3/3/3/1 tokens; budget 5 -> starts 0,3,6,9 ->
        # chunks 0,0,1,1
        assert [r.n_sentences for r in out] == [2, 2]
        assert out[0].chunk_text == "one two three. four five six! "
        assert out[1].chunk_text == "seven eight nine? ten"
        # reassembling chunks reproduces the document verbatim
        assert "".join(r.chunk_text for r in out) == text

    def test_giant_sentence_gets_own_chunk(self, spark):
        from data_rivers_spark.operators.chunking import chunk_by_sentences

        text = " ".join(["w"] * 20) + ". short one."
        df = _docs(spark, [(1, text)])
        out = sorted(
            chunk_by_sentences(df, "text", "doc_id", budget_tokens=8).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert out[0].n_sentences == 1 and out[0].n_tokens == 20
        assert out[1].chunk_text == "short one."

    def test_unterminated_and_empty(self, spark):
        from data_rivers_spark.operators.chunking import chunk_by_sentences

        df = _docs(spark, [(1, "no terminator here"), (2, "")])
        out = chunk_by_sentences(df, "text", "doc_id", budget_tokens=4).collect()
        assert {r.doc_id for r in out} == {1}  # empty doc emits nothing
        assert out[0].chunk_text == "no terminator here"

    def test_abbreviations_split_is_the_recorded_contract(self, spark):
        # SENTENCE_PATTERN deliberately treats EVERY '.' run as a
        # terminator (docstring: the oracle-replayability trade), so
        # abbreviations and decimals over-split. Pin it so a future
        # "smarter" splitter is a recorded semantic change, not drift.
        import re

        from data_rivers_spark.operators.chunking import (
            SENTENCE_PATTERN,
            chunk_by_sentences,
        )

        text = "U.S. Steel was founded in 1901. Pi is 3.14 roughly."
        assert re.findall(SENTENCE_PATTERN, text) == [
            "U.",
            "S. ",
            "Steel was founded in 1901. ",
            "Pi is 3.",
            "14 roughly.",
        ]
        df = _docs(spark, [(1, text)])
        out = sorted(
            chunk_by_sentences(df, "text", "doc_id", budget_tokens=100).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert out[0].n_sentences == 5  # 2 abbrev splits + 1 decimal split
        # over-splitting never loses text: the chunk is still verbatim
        assert "".join(r.chunk_text for r in out) == text

    def test_abbrev_aware_mode_keeps_lexicon_periods(self, spark):
        # the opt-in counterpart to the naive contract above: with
        # abbrev_aware=True the SAME fixture parses as the two true
        # sentences — lexicon titles, dotted acronyms, and decimals no
        # longer terminate — and the text is still reassembled verbatim
        # (the sentinel masking round-trips).
        from data_rivers_spark.operators.chunking import chunk_by_sentences

        text = "U.S. Steel was founded in 1901. Pi is 3.14 roughly."
        df = _docs(spark, [(1, text)])
        out = sorted(
            chunk_by_sentences(
                df, "text", "doc_id", budget_tokens=100, abbrev_aware=True
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert out[0].n_sentences == 2
        assert "".join(r.chunk_text for r in out) == text

        rich = (
            "Mr. Smith met Dr. Jones at U.S. Steel. The index rose "
            "3.14 points vs. Friday. Costs fell, etc. It ended."
        )
        out2 = sorted(
            chunk_by_sentences(
                _docs(spark, [(2, rich)]), "text", "doc_id",
                budget_tokens=100, abbrev_aware=True,
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        # 'etc.' mid-sentence is masked, so: sentence 1 (Mr/Dr/U.S.),
        # sentence 2 (decimal + vs.), sentence 3 (etc. glues to 'It ended.')
        assert out2[0].n_sentences == 3
        assert "".join(r.chunk_text for r in out2) == rich

    def test_abbrev_aware_strips_preexisting_sentinel_bytes(self, spark):
        # arbitrary corpora contain arbitrary bytes: a pre-existing \x01
        # must NOT be rewritten to '.' by the restore step (the old
        # corruption), nor confuse the acronym-continuation rewrite — it
        # is REMOVED, the documented abbrev-mode contract; naive mode
        # passes it through verbatim.
        from data_rivers_spark.operators.chunking import chunk_by_sentences

        text = "Alpha\x01beta stays. Dr. Who left.\x01 Pi is 3.14 now."
        df = _docs(spark, [(1, text)])
        out = sorted(
            chunk_by_sentences(
                df, "text", "doc_id", budget_tokens=100, abbrev_aware=True
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        joined = "".join(r.chunk_text for r in out)
        assert joined == text.replace("\x01", "")
        assert out[0].n_sentences == 3  # Dr./3.14 masked; 3 real sentences
        # naive mode: untouched bytes, verbatim round-trip
        naive = chunk_by_sentences(df, "text", "doc_id", budget_tokens=100).collect()
        assert "".join(
            r.chunk_text for r in sorted(naive, key=lambda r: r.chunk_idx)
        ) == text

    def test_abbrev_aware_default_unchanged(self, spark):
        # abbrev_aware defaults False: identical output to the naive mode
        from data_rivers_spark.operators.chunking import chunk_by_sentences

        text = "Dr. Who left. Mrs. Pi is 3.14 now."
        df = _docs(spark, [(1, text)])
        naive = chunk_by_sentences(df, "text", "doc_id", budget_tokens=8).collect()
        default = chunk_by_sentences(
            df, "text", "doc_id", budget_tokens=8, abbrev_aware=False
        ).collect()
        assert sorted(map(tuple, naive)) == sorted(map(tuple, default))
