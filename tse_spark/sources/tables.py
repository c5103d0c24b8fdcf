"""Table IO abstraction: Iceberg-shaped interface, parquet fallback.

The north_star persists posting shards and stage checkpoints as
Iceberg-backed tables.  This sandbox has no Iceberg runtime jar, so the
writer is abstracted behind one interface (SURVEY.md §7 step 3): the
default :class:`ParquetTableIO` lays data out identically (one directory
per table, snapshot semantics via atomic ``_SUCCESS``-gated overwrite);
:class:`IcebergTableIO` activates when the ``spark.sql.catalog.*`` jars
are present and uses ``writeTo(...).createOrReplace()``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Interface: resolve logical table names under a warehouse root."""

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError

    def exists(self, name: str) -> bool:
        raise NotImplementedError


class ParquetTableIO(TableIO):
    def __init__(self, root: str) -> None:
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))


class IcebergTableIO(TableIO):
    """Iceberg-backed tables (``catalog.db.name``).  Requires the
    iceberg-spark-runtime jar on the classpath; ``available()`` gates use."""

    def __init__(self, catalog: str = "local", db: str = "tse") -> None:
        self.prefix = f"{catalog}.{db}"

    @staticmethod
    def available(spark: SparkSession) -> bool:
        # NOTE: a bare ``spark._jvm.org.apache.iceberg.Table`` attribute
        # access is NOT a presence test — py4j lazily returns a
        # JavaPackage for any dotted path without touching the
        # classpath.  Class.forName actually loads (or fails to load)
        # the class.
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.Table"
            )
            return True
        except Exception:
            return False

    def _ident(self, name: str) -> str:
        return f"{self.prefix}.{name}"

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if mode == "overwrite":
            df.writeTo(self._ident(name)).createOrReplace()
        else:
            df.writeTo(self._ident(name)).append()

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.table(self._ident(name))

    def exists(self, name: str) -> bool:  # pragma: no cover - needs jars
        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        return spark.catalog.tableExists(self._ident(name))


def get_table_io(spark: SparkSession, root: str) -> TableIO:
    if IcebergTableIO.available(spark):  # pragma: no cover - needs jars
        return IcebergTableIO()
    return ParquetTableIO(root)
