"""Optional-format connectors, gated behind import/classpath checks.

The v1 container ships only the core Spark distribution: Delta/Iceberg
jars and JDBC drivers are absent. Per the build rules these are stubbed
with explicit errors (NOT silently skipped) so the API surface is
complete and a deployment with the jars on the classpath works
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake scan (requires delta-spark on the classpath)."""
    if not _has_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise NotImplementedError(
            "Delta Lake jars not on the classpath in this environment; "
            "add delta-spark and this call works unchanged"
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table scan (requires iceberg-spark-runtime)."""
    if not _has_class(spark, "org.apache.iceberg.spark.SparkCatalog"):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath in this environment; "
            "add iceberg-spark-runtime and this call works unchanged"
        )
    return spark.read.format("iceberg").load(table)


def read_jdbc(
    spark: SparkSession, url: str, dbtable: str, driver: str, **options
) -> DataFrame:
    """JDBC source (requires the driver jar)."""
    if not _has_class(spark, driver):
        raise NotImplementedError(
            f"JDBC driver {driver} not on the classpath in this environment"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
