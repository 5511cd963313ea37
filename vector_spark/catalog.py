"""Table catalog — Iceberg when available, parquet dirs otherwise.

BASELINE.json pins the production input to an Iceberg transcripts
table. This sandbox has no Iceberg runtime jar, so all code reads and
writes through this thin interface: against a real cluster, set
`spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`
(plus warehouse config) and the same calls hit Iceberg tables with
snapshot isolation, hidden partitioning, and incremental scans; in
the sandbox they fall back to parquet directories with the same
schema and partitioning layout, so nothing above this module changes.

What Iceberg buys at 100 TB (and the parquet fallback approximates):
* atomic commits + time travel -> the batch runner's _COMMITTED
  marker (runner_batch.py) is the degenerate single-writer form;
* hidden partitioning (days(ts), bucket(conv_id)) -> explicit
  partitionBy columns here;
* merge-on-read upserts -> overwrite-by-partition here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 - any classload failure = absent
        return False


class TableCatalog:
    """Resolve logical table names to DataFrames, engine-agnostic.

    catalog = TableCatalog(spark, warehouse="/data/wh")   # parquet
    catalog = TableCatalog(spark, iceberg_catalog="ice")  # Iceberg
    df = catalog.read("transcripts")
    catalog.write(df, "routed", partition_by=["_route", "role"])
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str | None = None,
        iceberg_catalog: str | None = None,
    ):
        if (warehouse is None) == (iceberg_catalog is None):
            raise ValueError("exactly one of warehouse/iceberg_catalog")
        if iceberg_catalog is not None and not iceberg_available(spark):
            raise RuntimeError(
                "iceberg_catalog requested but no Iceberg runtime on classpath"
            )
        self.spark = spark
        self.warehouse = warehouse
        self.iceberg_catalog = iceberg_catalog

    def _ident(self, name: str) -> str:
        return f"{self.iceberg_catalog}.{name}"

    def read(self, name: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(f"{self.warehouse}/{name}")

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        if self.iceberg_catalog:
            w = df.writeTo(self._ident(name))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(f"{self.warehouse}/{name}")

    def exists(self, name: str) -> bool:
        if self.iceberg_catalog:
            return self.spark.catalog.tableExists(self._ident(name))
        import os

        return os.path.exists(f"{self.warehouse}/{name}/_SUCCESS")
