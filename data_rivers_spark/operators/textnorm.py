"""Unicode and structural text normalization — pre-dedup canonicalization.

Web-crawled corpora mix NFC and NFD encodings of the same glyphs ('café'
composed vs 'cafe' + U+0301), which silently defeats exact dedup, minhash
shingles, and vocabulary building. Normalizing to NFC before any hashing
step is standard corpus hygiene (CCNet, RefinedWeb). Spark has no built-in
Unicode-normalization expression, so this is one of the few justified
pandas UDFs in the engine: Python's ``unicodedata.normalize`` over Arrow
string batches — vectorized transfer, C-implemented kernel, no per-row
Python objects beyond the string itself.

``remove_repeated_lines`` is the structural twin: order-preserving
first-occurrence line dedup WITHIN a document (boilerplate nav bars,
repeated footers), pure Catalyst — split → array_distinct (documented to
keep first occurrences in encounter order) → rejoin. No shuffle, no UDF.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def _nfc_udf(texts: pd.Series) -> pd.Series:
    # unicodedata.normalize is idempotent and locale-independent; NULLs
    # pass through untouched so the column's null semantics are preserved
    return texts.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def nfc_normalize_text(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Replace (or add) a column with the NFC-normalized text.

    Scale: Arrow-batched pandas UDF — a pure map, composes with any
    partitioning, no shuffle. The UDF is justified (vs built-ins) because
    Catalyst has no Unicode-normalization expression; a JVM-side
    ``java.text.Normalizer`` call would need a Scala UDF the repo can't
    ship. Throughput is memory-bandwidth bound (~GB/s per core), never the
    pipeline bottleneck next to a shuffle."""
    return df.withColumn(out_col or text_col, _nfc_udf(F.col(text_col)))


def remove_repeated_lines(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    line_sep: str = "\n",
) -> DataFrame:
    """Drop within-document repeated lines, keeping each line's FIRST
    occurrence in document order, and rejoin — the intra-doc half of
    paragraph dedup (dedup.paragraph_dedup handles the cross-doc half).

    ``array_distinct`` preserves first-occurrence encounter order (Spark's
    implementation walks the array once with a seen-set), which is exactly
    the cleaner semantics: the document reads the same with later copies
    excised. Whole-stage codegen, per-row, no shuffle."""
    lines = F.split(F.col(text_col), line_sep)
    return df.withColumn(
        out_col or text_col, F.array_join(F.array_distinct(lines), line_sep)
    )
