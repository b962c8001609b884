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


#: Apache Derby's embedded driver ships inside the Spark distribution
#: itself (derby-*.jar, pulled in for the Hive metastore), so unlike
#: Delta/Iceberg the JDBC path is EXERCISABLE in this container — the
#: io17 roundtrip runs it for real. Embedded Derby lives in the driver
#: JVM, which is exactly the local[*] test topology; on a real cluster
#: the same code points at a network JDBC URL and nothing changes.
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc(
    spark: SparkSession, url: str, dbtable: str, driver: str, **options
) -> DataFrame:
    """JDBC source (requires the driver jar). Pass ``partitionColumn`` /
    ``lowerBound`` / ``upperBound`` / ``numPartitions`` to split the
    scan into parallel range queries — the ONLY way a JDBC read scales
    past one task; without them Spark reads the whole table through a
    single connection."""
    if not _has_class(spark, driver):
        raise NotImplementedError(
            f"JDBC driver {driver} not on the classpath in this environment"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("driver", driver)
    )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, dbtable: str, driver: str, mode: str = "overwrite",
    **options,
) -> None:
    """JDBC sink (requires the driver jar). Each write partition opens
    its own connection and inserts in batches (``batchsize``), so the
    write parallelism is the DataFrame's partitioning — repartition
    before writing to match what the target database can absorb."""
    if not _has_class(df.sparkSession, driver):
        raise NotImplementedError(
            f"JDBC driver {driver} not on the classpath in this environment"
        )
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("driver", driver)
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.save()
