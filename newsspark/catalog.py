"""Thin catalog seam: Iceberg-shaped table IO with a parquet fallback.

The north rule specifies an Iceberg-to-Iceberg batch job; no Iceberg runtime
jars are guaranteed in this sandbox, so all table IO goes through this seam.
``IcebergCatalog`` is used when the session has an Iceberg catalog configured
(``spark.sql.catalog.<name>``); otherwise ``ParquetCatalog`` provides the same
surface over a directory, with a deterministic snapshot id derived from the
committed file listing (stands in for Iceberg's snapshot id in lineage rows).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir.rstrip("/")

    def path(self, table: str) -> str:
        return f"{self.base_dir}/{table}"

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: Optional[list] = None,
    ) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def snapshot_id(self, table: str) -> str:
        """Deterministic content-address of the committed file set.

        Local-filesystem only: ``os.walk`` sees nothing behind hdfs://,
        s3://, ... URIs, which would silently hash an empty listing and
        stamp every lineage row with the same meaningless constant — on a
        cluster use ``IcebergCatalog.snapshot_id`` (a real table snapshot)
        instead.  An existing-but-fileless table returns '' (explicitly "no
        snapshot"), never a constant hash."""
        if "://" in self.base_dir:
            raise NotImplementedError(
                "ParquetCatalog.snapshot_id requires a local filesystem "
                f"path, got {self.base_dir!r}; use IcebergCatalog on a "
                "cluster"
            )
        root = self.path(table)
        names = []
        for dirpath, _, files in os.walk(root):
            rel = os.path.relpath(dirpath, root)
            names.extend(
                f"{rel}/{f}:{os.path.getsize(os.path.join(dirpath, f))}"
                for f in files
                if f.endswith(".parquet")
            )
        if not names:
            return ""
        digest = hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()
        return digest[:16]


class IcebergCatalog:
    """Real Iceberg path — requires iceberg-spark-runtime on the classpath."""

    def __init__(self, catalog: str, namespace: str = "newsspark"):
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: Optional[list] = None,
    ) -> None:
        writer = df.writeTo(self._ident(table))
        if partition_by and mode != "append":
            # identity partition spec (Iceberg partitionedBy applies at
            # table (re)creation; appends inherit the existing spec)
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.table(self._ident(table))

    def snapshot_id(self, spark: SparkSession, table: str) -> str:
        row = (
            spark.sql(f"SELECT snapshot_id FROM {self._ident(table)}.snapshots "
                      "ORDER BY committed_at DESC LIMIT 1")
            .collect()
        )
        return str(row[0][0]) if row else ""


def get_catalog(spark: SparkSession, base_dir: str, catalog: Optional[str] = None):
    """Prefer Iceberg when a catalog is configured; fall back to parquet."""
    if catalog and spark.conf.get(f"spark.sql.catalog.{catalog}", None):
        return IcebergCatalog(catalog)
    return ParquetCatalog(base_dir)
