"""Managed mutable-table layer over immutable Parquet.

The reference mutates BigQuery tables in place (INSERT/UPDATE/DELETE/MERGE —
SURVEY.md §1.4); Spark tables are files. This catalog provides the same
verbs as read → pure transform (operators.relational) → atomic swap:
a new version directory is written, then a pointer file is atomically
renamed onto it. Readers always see a complete version; concurrent readers
of the old version are unaffected (the old dir is retained for
``keep_versions``).

Scale notes: every mutation is a full-table rewrite — exactly what the
reference's DELETE+INSERT pattern does logically (and what Delta/Iceberg
optimize with file-level pruning; swap this backend for Delta when available).
Partition large tables on write (partition_by=...) so downstream reads prune.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from data_rivers_spark.operators import relational as R


class ManagedCatalog:
    """Directory-backed table catalog: {root}/{table}/v{n}/ + {table}/_current."""

    def __init__(self, spark: SparkSession, root: str, keep_versions: int = 2):
        self.spark = spark
        self.root = root
        self.keep_versions = keep_versions
        os.makedirs(root, exist_ok=True)

    # -- version plumbing ---------------------------------------------------

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_current")

    def _current_version(self, name: str) -> int | None:
        try:
            with open(self._pointer(name)) as f:
                return json.load(f)["version"]
        except (OSError, ValueError, KeyError):
            return None

    def _data_dir(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"v{version}")

    def exists(self, name: str) -> bool:
        return self._current_version(name) is not None

    def list_tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root) if os.path.exists(self._pointer(d))
        )

    # -- verbs --------------------------------------------------------------

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read the current version, or time-travel to a retained older one
        (versions survive ``keep_versions`` mutations back)."""
        v = version if version is not None else self._current_version(name)
        if v is None:
            raise FileNotFoundError(f"managed table not found: {name}")
        path = self._data_dir(name, v)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"version v{v} of {name} not retained")
        return self.spark.read.parquet(path)

    def versions(self, name: str) -> list[int]:
        tdir = self._tdir(name)
        if not os.path.isdir(tdir):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(tdir) if d.startswith("v") and d[1:].isdigit()
        )

    def create_or_replace(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        """WRITE_TRUNCATE semantics (landing tables, qalert_airflow.py:96-107)."""
        old = self._current_version(name)
        new = (old or 0) + 1
        os.makedirs(self._tdir(name), exist_ok=True)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        path = self._data_dir(name, new)
        writer.parquet(path)
        tmp = self._pointer(name) + f".tmp.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump({"version": new, "updated_ns": time.time_ns()}, f)
        os.replace(tmp, self._pointer(name))  # atomic pointer swap
        self._gc(name, new)

    def _gc(self, name: str, current: int) -> None:
        tdir = self._tdir(name)
        for d in os.listdir(tdir):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) <= current - self.keep_versions:
                shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)

    def insert_into(self, name: str, df: DataFrame) -> None:
        """INSERT append. Materializes old ∪ new into a fresh version (atomic,
        unlike parquet append-in-place which readers could see half-written)."""
        self.create_or_replace(self.read(name).unionByName(df), name)

    def insert_new_records(self, name: str, incoming: DataFrame, key: str | list[str]) -> None:
        """INSERT … WHERE key NOT IN master (general_queries.py:87-98)."""
        self.create_or_replace(R.insert_new_records(self.read(name), incoming, key), name)

    def merge_upsert(
        self,
        name: str,
        incoming: DataFrame,
        key: str | list[str],
        update_cols: list[str],
        order_cols: list[str],
    ) -> None:
        """The generic incremental merge (SURVEY §3.2): insert_new +
        sync_update with a window-deduped source."""
        self.create_or_replace(
            R.incremental_merge(self.read(name), incoming, key, update_cols, order_cols), name
        )

    def delete_where(self, name: str, condition) -> None:
        """DELETE WHERE cond → keep ¬cond (general_queries.py:165-169)."""
        self.create_or_replace(self.read(name).filter(~condition), name)

    def drop_table(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)

    def drop_table_group(self, prefix: str) -> None:
        """DROP TABLE loop over LIKE-matched names
        (transform_enrich_requests.py:71-85)."""
        for t in self.list_tables():
            if t.startswith(prefix):
                self.drop_table(t)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) metastore table.

    The 100 TB lever for repeated co-located joins/aggregations: two tables
    bucketed by the same key into the same bucket count join with NO exchange
    on either side (and no sort, if sort_cols match) — the shuffle is paid
    once at write time instead of per query. This is the Spark analogue of
    the reference keeping BigQuery tables clustered by key."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
