"""SQL-callable transform functions (SURVEY §2.6: the engine should expose
its transform library both as DataFrame functions and as registered SQL
functions).

Spark 4 SQL UDFs (CREATE TEMPORARY FUNCTION … RETURN <expr>) keep these fully
declarative — the bodies are Catalyst expressions, not Python, so SQL users
pay no serialization tax."""

from __future__ import annotations

from pyspark.sql import SparkSession

_DIGITS = "regexp_replace({0}, '[^0-9]', '')"

SQL_FUNCTIONS: dict[str, str] = {
    # NANP phone normalization (transforms.reformat_phone_numbers)
    "clean_phone": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION clean_phone(s STRING) RETURNS STRING
        RETURN CASE WHEN s IS NULL THEN NULL ELSE
          CASE WHEN LENGTH({_DIGITS.format('s')}) > 10
               THEN '+' || substring({_DIGITS.format('s')}, 1, length({_DIGITS.format('s')}) - 10)
               ELSE '+1' END
          || ' (' || substring(right({_DIGITS.format('s')}, 10), 1, 3) || ') '
          || substring(right({_DIGITS.format('s')}, 10), 4, 3) || '-'
          || substring(right({_DIGITS.format('s')}, 10), 7, 4) END
    """,
    # whitespace token count (textstats.token_count_ws)
    "token_count_ws": """
        CREATE OR REPLACE TEMPORARY FUNCTION token_count_ws(s STRING) RETURNS INT
        RETURN CASE WHEN s IS NULL OR trim(s) = '' THEN 0
                    ELSE size(split(trim(lower(s)), '\\\\s+')) END
    """,
    # word-set jaccard (dedup.jaccard_words)
    "jaccard_words": """
        CREATE OR REPLACE TEMPORARY FUNCTION jaccard_words(a STRING, b STRING) RETURNS DOUBLE
        RETURN CASE
          WHEN size(array_union(array_distinct(split(trim(lower(a)), '\\\\s+')),
                                array_distinct(split(trim(lower(b)), '\\\\s+')))) = 0 THEN 1.0
          ELSE size(array_intersect(array_distinct(split(trim(lower(a)), '\\\\s+')),
                                    array_distinct(split(trim(lower(b)), '\\\\s+')))) /
               CAST(size(array_union(array_distinct(split(trim(lower(a)), '\\\\s+')),
                                     array_distinct(split(trim(lower(b)), '\\\\s+')))) AS DOUBLE)
          END
    """,
    # normalized 64-bit fingerprint (textstats.fingerprint)
    "fingerprint64": """
        CREATE OR REPLACE TEMPORARY FUNCTION fingerprint64(s STRING) RETURNS BIGINT
        RETURN xxhash64(regexp_replace(trim(lower(s)), '\\\\s+', ' '))
    """,
    # '' → NULL (the nullstr cast, transforms.change_data_types)
    "nullstr": """
        CREATE OR REPLACE TEMPORARY FUNCTION nullstr(s STRING) RETURNS STRING
        RETURN nullif(s, '')
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every SQL UDF; returns the registered names."""
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(SQL_FUNCTIONS)
