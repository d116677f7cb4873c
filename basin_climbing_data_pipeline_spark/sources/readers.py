"""Bronze-layer source readers: CSV table scans, nested-JSON flattening.

The reference lands everything as header CSV on S3 and re-reads whole tables
per job (S1/S2 — upload_data.py:37-93), and flattens paginated API JSON into
rows with a roster explode (S6 — fetch_capitan_membership_data.py:221-297).
The engine equivalents:

- CSV: explicit-schema header CSV read/write (schema inference is the
  reference's behavior, but explicit StructTypes are the engine's contract —
  SURVEY.md §1.3); permissive mode tolerates bad rows like the reference's
  errors='coerce'.
- JSON: ``spark.read.json`` with nested StructType/ArrayType, dotted-path
  projection, and ``explode`` for roster arrays.

These are the ingestion compat layer; the driver's parquet tables remain the
catalog of record (io.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_table(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def write_csv_table(df: DataFrame, path: str) -> None:
    """Full-overwrite CSV sink (the reference's S2 semantics)."""
    df.write.mode("overwrite").option("header", True).csv(path)


MEMBERSHIP_JSON_SCHEMA = T.StructType(
    [
        T.StructField("membership_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField(
            "billing",
            T.StructType(
                [
                    T.StructField("amount", T.DoubleType()),
                    T.StructField("interval", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "all_customers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("customer_id", T.LongType()),
                        T.StructField("first_name", T.StringType()),
                        T.StructField("last_name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_membership_json(spark: SparkSession, path: str) -> DataFrame:
    """Nested membership JSON → flat membership rows (dotted-path select)."""
    raw = spark.read.schema(MEMBERSHIP_JSON_SCHEMA).json(path)
    return raw.select(
        "membership_id",
        "name",
        "status",
        F.col("billing.amount").alias("billing_amount"),
        F.col("billing.interval").alias("billing_interval"),
        F.size(F.coalesce("all_customers", F.array())).alias("roster_size"),
    )


def explode_membership_roster(spark: SparkSession, path: str) -> DataFrame:
    """S6 roster explode: one row per member of each membership
    (fetch_capitan_membership_data.py:266-297)."""
    raw = spark.read.schema(MEMBERSHIP_JSON_SCHEMA).json(path)
    return raw.select(
        "membership_id",
        F.explode("all_customers").alias("member"),
    ).select(
        "membership_id",
        F.col("member.customer_id").alias("customer_id"),
        F.col("member.first_name").alias("first_name"),
        F.col("member.last_name").alias("last_name"),
    )


def list_keys(root: str, prefix: str = "") -> list[str]:
    """S7 list-keys catalog scan (reference upload_data.py:48-64).

    The reference paginates ``list_objects_v2`` over an object-store prefix
    and returns the flat key list.  The engine analog treats a filesystem
    directory as the store: keys are slash-delimited paths relative to
    ``root``, filtered by ``prefix``, sorted for determinism.  Listing is a
    control-plane operation (the store's index, not the data), so it runs
    driver-side just as boto3's paginator does — the data-plane stays in
    Spark via ``catalog_scan``.
    """
    import os

    keys = []
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        for fn in filenames:
            key = fn if rel == "." else f"{rel}/{fn}".replace(os.sep, "/")
            if key.startswith(prefix):
                keys.append(key)
    return sorted(keys)


def catalog_scan(spark: SparkSession, root: str, prefix: str = "") -> DataFrame:
    """The listed keys as a DataFrame with object sizes, so catalog audits
    (orphaned files, size-by-table rollups) run as ordinary queries."""
    import os

    rows = [
        (k, int(os.path.getsize(os.path.join(root, k)))) for k in list_keys(root, prefix)
    ]
    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("size_bytes", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)
