"""Driver-contract queries for the round-5 corpus-shaping operators:
token-window chunking (+ packing) and text normalization (Unicode NFC,
within-doc repeated-line removal).

Same fixture discipline as dataops_queries.py: the synthetic corpus is
clean, so fixtures plant what the operator must find (NFD sequences,
duplicated lines) inside the query, keeping each oracle a pure function of
the input tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_rivers_spark.operators.chunking import chunk_and_pack, chunk_documents
from data_rivers_spark.operators.textnorm import (
    nfc_normalize_text,
    remove_repeated_lines,
)
from data_rivers_spark.plans.registry import query
from data_rivers_spark.session import load_tables

# the tokenize-and-window CTE both chunk oracles share (chunk=32, step=24)
_CHUNK_CTE = """
    toks AS (
      SELECT doc_id,
             CASE WHEN REGEXP_REPLACE(text, '^\\s+|\\s+$', '', 'g') = ''
                  THEN []::VARCHAR[]
                  ELSE STRING_SPLIT_REGEX(
                    REGEXP_REPLACE(LOWER(text), '^\\s+|\\s+$', '', 'g'),
                    '\\s+') END AS ws
      FROM documents
    ), nn AS (
      SELECT doc_id, ws, LEN(ws) AS n FROM toks WHERE LEN(ws) > 0
    ), chunks AS (
      SELECT doc_id, i AS chunk_idx,
             ARRAY_TO_STRING(ws[i*24+1 : i*24+32], ' ') AS chunk_text,
             LEN(ws[i*24+1 : i*24+32]) AS n_chunk_tokens
      FROM nn, UNNEST(GENERATE_SERIES(0,
             CASE WHEN n <= 32 THEN 0
                  ELSE CAST((n - 32 + 23) // 24 AS INT) END)) AS t(i)
    )
"""


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH {_CHUNK_CTE}
    SELECT doc_id, chunk_idx, chunk_text, n_chunk_tokens FROM chunks
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token windows, 8-token
    overlap → step 24): the RAG / context-window prep step. One Generate,
    no shuffle; every output is integer or deterministic text, so the
    DuckDB slice replay is hash-exact."""
    t = load_tables(spark, sf_dir, ["documents"])
    return chunk_documents(
        t["documents"], "text", "doc_id", chunk_tokens=32, overlap_tokens=8
    )


@query(
    "q_chunk_pack",
    oracle=f"""
    WITH {_CHUNK_CTE}
    , sharded AS (
      SELECT CAST(CONCAT('0x', SUBSTR(MD5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 8 AS shard, *
      FROM chunks
    )
    SELECT shard,
           CAST(FLOOR((SUM(n_chunk_tokens) OVER (
                  PARTITION BY shard ORDER BY doc_id, chunk_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_chunk_tokens) / 128.0) AS BIGINT) AS seq_id,
           doc_id, chunk_idx, n_chunk_tokens
    FROM sharded
    """,
)
def q_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk then concat-then-chunk pack into 128-token training sequences
    within 8 md5-hash shards (md5 so the oracle replays the shard; the
    operator's scale default is xxhash64). Start-position binning matches
    textstats.sequential_pack."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].withColumn(
        "shard",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 8
        ),
    )
    return chunk_and_pack(
        docs, "text", "doc_id",
        chunk_tokens=32, overlap_tokens=8, pack_budget=128, shard_col="shard",
    )


@query(
    "q_nfc_normalize",
    oracle="""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000,
             'cafe' || CHR(769) || ' ' || SUBSTR(text, 1, 40)
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           NFC_NORMALIZE(text) AS norm_text,
           LEN(text) AS n_chars_raw,
           LEN(NFC_NORMALIZE(text)) AS n_chars_nfc,
           (NFC_NORMALIZE(text) != text) AS changed
    FROM aug
    """,
)
def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (pre-dedup canonicalization): planted NFD
    rows ('cafe' + U+0301 combining acute) must compose to 'café' — 5 raw
    chars to 4 — while already-NFC rows pass through byte-identical.
    Engine = Arrow pandas UDF (unicodedata.normalize); oracle = DuckDB's
    built-in NFC_NORMALIZE. Both implement UAX #15, so outputs are
    codepoint-identical, not merely similar."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select("doc_id", "text")
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(
                F.lit("cafe" + chr(769) + " "), F.substring("text", 1, 40)
            ).alias("text"),
        )
    )
    out = nfc_normalize_text(aug, "text", out_col="norm_text")
    return out.select(
        "doc_id",
        "norm_text",
        F.length("text").alias("n_chars_raw"),
        F.length("norm_text").alias("n_chars_nfc"),
        (F.col("norm_text") != F.col("text")).alias("changed"),
    )


@query(
    "q_remove_repeated_lines",
    oracle="""
    WITH aug AS (
      SELECT doc_id, text || CHR(10) || text AS text FROM documents
    ), l AS (
      SELECT doc_id, lines[i] AS line, i AS pos
      FROM (SELECT doc_id, STRING_SPLIT(text, CHR(10)) AS lines FROM aug),
           UNNEST(GENERATE_SERIES(1, LEN(lines))) AS t(i)
    ), f AS (
      SELECT doc_id, line, pos,
             ROW_NUMBER() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
      FROM l
    ), raw_n AS (
      SELECT doc_id, LEN(STRING_SPLIT(text, CHR(10))) AS n_lines_raw FROM aug
    )
    SELECT f.doc_id,
           ARRAY_TO_STRING(LIST(line ORDER BY pos), CHR(10)) AS clean_text,
           ANY_VALUE(n_lines_raw) AS n_lines_raw,
           COUNT(*) AS n_lines_clean
    FROM f JOIN raw_n ON f.doc_id = raw_n.doc_id
    WHERE rn = 1 GROUP BY f.doc_id
    """,
)
def q_remove_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line removal (boilerplate excision), first
    occurrence kept in document order: every doc is planted with a full
    second copy of its own lines (text||\\n||text), so the cleaner must
    reconstruct exactly the original's distinct-line sequence.
    array_distinct's first-occurrence order IS the contract being tested —
    the oracle rebuilds it independently via ROW_NUMBER per (doc, line)."""
    t = load_tables(spark, sf_dir, ["documents"])
    aug = t["documents"].select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\n"), F.col("text")).alias("text"),
    )
    out = remove_repeated_lines(aug, "text", out_col="clean_text")
    return out.select(
        "doc_id",
        "clean_text",
        F.size(F.split("text", "\n")).alias("n_lines_raw"),
        F.size(F.split("clean_text", "\n")).alias("n_lines_clean"),
    )


@query(
    "q_perplexity_buckets",
    oracle="""
    WITH ex AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT_REGEX(REGEXP_REPLACE(LOWER(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
      FROM documents WHERE REGEXP_REPLACE(text, '^\\s+|\\s+$', '', 'g') != ''
    ), lm AS (
      SELECT token, COUNT(*) AS cnt FROM ex GROUP BY token
    ), t AS (
      SELECT SUM(cnt) AS total FROM lm
    ), scored AS (
      SELECT e.doc_id, ROUND(AVG(LN(lm.cnt * 1.0 / t.total)), 4) AS unigram_logprob
      FROM ex e JOIN lm USING (token) CROSS JOIN t
      GROUP BY e.doc_id
    ), ranked AS (
      SELECT s.doc_id, d.lang, s.unigram_logprob,
             PERCENT_RANK() OVER (PARTITION BY d.lang
               ORDER BY s.unigram_logprob DESC, s.doc_id) AS pr
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, unigram_logprob,
           CASE WHEN pr < 1.0/3 THEN 'head'
                WHEN pr < 2.0/3 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): per-
    LANGUAGE percentile of the self-unigram-LM fluency score splits the
    corpus into head/middle/tail thirds — head is the most-fluent slice a
    curation pipeline keeps outright, tail gets re-filtered or dropped.
    Composition of two independently-oracled pieces (unigram_logprob_score
    + percent_rank trim); the (score DESC, doc_id) order makes every rank
    distinct so both engines bucket identically. Scale: one token-keyed
    join for the LM, one lang-keyed window — percentiles per language, not
    global, so no single-partition sort. The whole thing is one operator
    call (textstats.perplexity_buckets) so it is also a spec verb."""
    from data_rivers_spark.operators import textstats as TX

    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select("doc_id", "text", "lang")
    return TX.perplexity_buckets(docs, "text", "doc_id", "lang")


@query(
    "q_chunk_sentences",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN REGEXP_REPLACE(text, '^\\s+|\\s+$', '', 'g') = ''
                  THEN []::VARCHAR[]
                  ELSE STRING_SPLIT_REGEX(
                    REGEXP_REPLACE(LOWER(text), '^\\s+|\\s+$', '', 'g'),
                    '\\s+') END AS ws
      FROM documents
    ), dotted AS (
      -- plant sentence terminators: 7-token sentences ending in '.'
      SELECT doc_id,
             ARRAY_TO_STRING(LIST_TRANSFORM(
               GENERATE_SERIES(0, CAST(CEIL(LEN(ws) / 7.0) AS INT) - 1),
               i -> ARRAY_TO_STRING(ws[i*7+1 : i*7+7], ' ') || '.'), ' ') AS text
      FROM toks WHERE LEN(ws) > 0
    ), s AS (
      SELECT doc_id, arr[i] AS sent, i AS pos
      FROM (SELECT doc_id,
                   REGEXP_EXTRACT_ALL(text, '[^.!?]+[.!?]+\\s*|[^.!?]+$') AS arr
            FROM dotted),
           UNNEST(GENERATE_SERIES(1, LEN(arr))) AS t(i)
    ), tok AS (
      SELECT doc_id, pos, sent,
             CASE WHEN REGEXP_REPLACE(sent, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                  ELSE LEN(STRING_SPLIT_REGEX(
                    REGEXP_REPLACE(LOWER(sent), '^\\s+|\\s+$', '', 'g'),
                    '\\s+')) END AS n_tok
      FROM s
    ), b AS (
      SELECT doc_id, pos, sent, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tok) / 24.0) AS BIGINT) AS chunk_idx
      FROM tok
    )
    SELECT doc_id, chunk_idx,
           STRING_AGG(sent, '' ORDER BY pos) AS chunk_text,
           COUNT(*) AS n_sentences,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM b GROUP BY doc_id, chunk_idx
    """,
)
def q_chunk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary chunking into 24-token-budget chunks — the
    never-split-mid-sentence RAG segmentation. The corpus has no natural
    terminators, so the fixture re-punctuates each doc into 7-token dotted
    sentences first (both engines replay the identical construction);
    budget 24 then packs ~3 sentences per chunk with a short tail. The
    segmentation regex is restricted to Java/RE2-common syntax
    (chunking.SENTENCE_PATTERN) so the oracle extracts identical sentence
    slices; binning and concatenation are pure integer/window arithmetic."""
    from data_rivers_spark.operators.chunking import chunk_by_sentences
    from data_rivers_spark.operators.dedup import words

    t = load_tables(spark, sf_dir, ["documents"])
    ws = words(F.col("text"))
    nsent = F.ceil(F.size(ws) / F.lit(7.0)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), nsent - 1),
        lambda i: F.concat(F.concat_ws(" ", F.slice(ws, i * 7 + 1, 7)), F.lit(".")),
    )
    dotted = (
        t["documents"]
        .filter(F.size(ws) > 0)
        .select("doc_id", F.array_join(sents, " ").alias("text"))
    )
    return chunk_by_sentences(dotted, "text", "doc_id", budget_tokens=24)


@query(
    "q_chunk_sentences_abbrev",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN REGEXP_REPLACE(text, '^\\s+|\\s+$', '', 'g') = ''
                  THEN []::VARCHAR[]
                  ELSE STRING_SPLIT_REGEX(
                    REGEXP_REPLACE(LOWER(text), '^\\s+|\\s+$', '', 'g'),
                    '\\s+') END AS ws
      FROM documents
    ), dotted AS (
      -- abbrev-laden preamble + the same 7-token dotted construction
      SELECT doc_id,
             'Mr. Jones met Dr. ' || ws[1]
             || ' at U.S. Steel. The index rose 3.14 points vs. Friday. '
             || ARRAY_TO_STRING(LIST_TRANSFORM(
               GENERATE_SERIES(0, CAST(CEIL(LEN(ws) / 7.0) AS INT) - 1),
               i -> ARRAY_TO_STRING(ws[i*7+1 : i*7+7], ' ') || '.'), ' ') AS text
      FROM toks WHERE LEN(ws) > 0
    ), masked AS (
      -- pre-strip pre-existing sentinels, then the same four ordered
      -- rewrites as chunking._mask_abbrev_periods
      SELECT doc_id,
             REGEXP_REPLACE(
               REGEXP_REPLACE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(REPLACE(text, chr(1), ''),
                     '(\\d)\\.(\\d)', '\\1' || chr(1) || '\\2', 'g'),
                   '([A-Za-z])\\.([A-Za-z])\\.',
                   '\\1' || chr(1) || '\\2' || chr(1), 'g'),
                 chr(1) || '([A-Za-z])\\.', chr(1) || '\\1' || chr(1), 'g'),
               '\\b(Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|vs|etc|Inc|Ltd|Corp|Fig|Vol|et al)\\.',
               '\\1' || chr(1), 'g') AS text
      FROM dotted
    ), s AS (
      SELECT doc_id, REPLACE(arr[i], chr(1), '.') AS sent, i AS pos
      FROM (SELECT doc_id,
                   REGEXP_EXTRACT_ALL(text, '[^.!?]+[.!?]+\\s*|[^.!?]+$') AS arr
            FROM masked),
           UNNEST(GENERATE_SERIES(1, LEN(arr))) AS t(i)
    ), tok AS (
      SELECT doc_id, pos, sent,
             CASE WHEN REGEXP_REPLACE(sent, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                  ELSE LEN(STRING_SPLIT_REGEX(
                    REGEXP_REPLACE(LOWER(sent), '^\\s+|\\s+$', '', 'g'),
                    '\\s+')) END AS n_tok
      FROM s
    ), b AS (
      SELECT doc_id, pos, sent, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tok) / 24.0) AS BIGINT) AS chunk_idx
      FROM tok
    )
    SELECT doc_id, chunk_idx,
           STRING_AGG(sent, '' ORDER BY pos) AS chunk_text,
           COUNT(*) AS n_sentences,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM b GROUP BY doc_id, chunk_idx
    """,
)
def q_chunk_sentences_abbrev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abbreviation-aware sentence chunking (chunk_by_sentences with
    abbrev_aware=True): the opt-in lexicon mode on a fixture that plants
    the exact artifacts the naive contract records — 'Mr.', 'Dr.',
    'U.S. Steel', a decimal, 'vs.' — in front of the same 7-token dotted
    construction as q_chunk_sentences. The masking is four ordered
    look-around-free rewrites (chunking._mask_abbrev_periods), so DuckDB
    replays segmentation exactly; the preamble parses as TWO sentences
    instead of the naive mode's eight fragments. Default behavior is
    untouched (q_chunk_sentences still pins the naive contract)."""
    from data_rivers_spark.operators.chunking import chunk_by_sentences
    from data_rivers_spark.operators.dedup import words

    t = load_tables(spark, sf_dir, ["documents"])
    ws = words(F.col("text"))
    nsent = F.ceil(F.size(ws) / F.lit(7.0)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), nsent - 1),
        lambda i: F.concat(F.concat_ws(" ", F.slice(ws, i * 7 + 1, 7)), F.lit(".")),
    )
    dotted = (
        t["documents"]
        .filter(F.size(ws) > 0)
        .select(
            "doc_id",
            F.concat(
                F.lit("Mr. Jones met Dr. "),
                F.element_at(ws, 1),
                F.lit(" at U.S. Steel. The index rose 3.14 points vs. Friday. "),
                F.array_join(sents, " "),
            ).alias("text"),
        )
    )
    return chunk_by_sentences(
        dotted, "text", "doc_id", budget_tokens=24, abbrev_aware=True
    )


@query(
    "q_url_domains",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example/page-' || CAST(doc_id AS VARCHAR)
                       || ' and http://mirror.example/x'
                  ELSE text END AS text
      FROM documents
    ), u AS (
      SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(text, 'https?://[^\\s]+')) AS url
      FROM aug
    ), h AS (
      SELECT doc_id, REGEXP_EXTRACT(url, 'https?://([^/\\s]+)', 1) AS domain FROM u
    )
    SELECT domain,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM h GROUP BY domain
    """,
)
def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL telemetry — the aggregate a crawl-curation pipeline
    feeds its domain blocklist/allowlist decisions from (RefinedWeb §3.1
    URL filtering operates on exactly this table). The corpus has no URLs,
    so the fixture plants two per third doc (one doc-varying domain, one
    constant). Extraction uses an RE2/Java-common pattern; host = first
    capture group, counted as (distinct docs, total occurrences) per
    domain. Scale: one Generate + one map-side-combinable aggregate on the
    domain key — no shuffle beyond the count. The extraction+aggregate is
    one operator call (textstats.url_domain_stats) so it is a spec verb."""
    from data_rivers_spark.operators import textstats as TX

    t = load_tables(spark, sf_dir, ["documents"])
    aug = t["documents"].select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" see https://site"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example/page-"),
                F.col("doc_id").cast("string"),
                F.lit(" and http://mirror.example/x"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return TX.url_domain_stats(aug, "text", "doc_id")
