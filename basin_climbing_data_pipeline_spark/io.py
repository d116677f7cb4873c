"""Table catalog + IO helpers.

The reference stores every table as one CSV object on S3 and re-reads it
whole for each job (reference data_pipeline/upload_data.py:69-93).  The new
engine's at-rest format is Parquet (columnar, predicate/projection pushdown,
partition pruning); the test catalog is the driver-generated star schema at
``/root/testdata/sf*/`` (see TESTDATA.md).

At 100 TB these readers stay valid: ``spark.read.parquet`` over a partitioned
prefix with pushed filters is exactly the cluster path; nothing here collects
to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog: {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which the Spark vectorized
        # reader rejects; read nanos as long and floor-convert to a
        # microsecond timestamp (matches DuckDB's ns->us truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        # integer division — nanos (~1.7e18) overflow double precision, so a
        # float divide here would be off by ±1 µs
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Overwrite-sink analog of the reference's full-table CSV overwrite
    (reference data_pipeline/upload_data.py:37-46), as parquet with optional
    date partitioning (the reference's monthly snapshot keying,
    pipeline_handler.py:343-354, becomes partitionBy)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
