"""JDBC pull — config builder + reader for warehouse-side extraction from
operational databases (the reference pulls the police RMS tables over JDBC,
gcs_utils.py:866-883 rmsprod_setup;
finance_tax_delinquency_gis_wprdc_extract.py:22-33).

No JDBC drivers ship in this container, so the value here is the validated
options builder (the part that's easy to get silently wrong) and a thin
``read_jdbc`` that applies it. Everything maps 1:1 onto Spark's JDBC source
options — nothing proprietary.

Scale notes: an unpartitioned JDBC read is ONE task holding one connection —
fine for dim-sized pulls, a bottleneck for facts. ``partition_column`` +
bounds + ``num_partitions`` shard the scan into parallel range queries;
``fetch_size`` keeps the per-row round-trip cost down (drivers default
absurdly low, e.g. Oracle 10). Pushdown: pass ``query`` (or later
``.filter``/``.select`` which Spark pushes into the WHERE clause) so the
database does the filtering, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DIALECT_URL = {
    "postgresql": "jdbc:postgresql://{host}:{port}/{database}",
    "mysql": "jdbc:mysql://{host}:{port}/{database}",
    "sqlserver": "jdbc:sqlserver://{host}:{port};databaseName={database}",
    "oracle": "jdbc:oracle:thin:@{host}:{port}/{database}",
}

_DIALECT_DRIVER = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "oracle": "oracle.jdbc.OracleDriver",
}

_DEFAULT_PORT = {"postgresql": 5432, "mysql": 3306, "sqlserver": 1433, "oracle": 1521}


def jdbc_url(dialect: str, host: str, database: str, port: int | None = None) -> str:
    """Connection URL for a known dialect (port defaults per dialect)."""
    if dialect not in _DIALECT_URL:
        raise ValueError(f"unknown JDBC dialect {dialect!r}; known: {sorted(_DIALECT_URL)}")
    return _DIALECT_URL[dialect].format(
        host=host, port=port or _DEFAULT_PORT[dialect], database=database
    )


def jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Validated option dict for Spark's JDBC source.

    Guards the three silent failure modes: ``table`` XOR ``query`` (Spark
    rejects both, and neither means an empty pull); partitioned reads need
    the full (column, lower, upper, num) quadruple or Spark falls back to a
    single connection without warning; ``query`` + ``partition_column`` is
    unsupported by Spark (wrap the query as a dbtable subquery instead)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    if query is not None and partition_column is not None:
        raise ValueError(
            "Spark does not support partition_column with query=; "
            "use table='(SELECT …) AS sub' instead"
        )
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part) and any(p is None for p in part):
        raise ValueError(
            "partitioned read needs ALL of partition_column, lower_bound, "
            "upper_bound, num_partitions — a partial set silently reads on one "
            "connection"
        )
    if driver is None:
        for dialect, prefix in (
            ("postgresql", "jdbc:postgresql:"),
            ("mysql", "jdbc:mysql:"),
            ("sqlserver", "jdbc:sqlserver:"),
            ("oracle", "jdbc:oracle:"),
        ):
            if url.startswith(prefix):
                driver = _DIALECT_DRIVER[dialect]
                break
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if table is not None:
        opts["dbtable"] = table
    if query is not None:
        opts["query"] = query
    if driver is not None:
        opts["driver"] = driver
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """``spark.read.format('jdbc')`` with a validated option set. Raises at
    ``.load()`` if the driver jar is absent — there is no fallback to fake
    data; JDBC is a hard external dependency by nature."""
    opts = jdbc_options(**kwargs)
    return spark.read.format("jdbc").options(**opts).load()
