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


def catalog_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 catalog scan wired into a driver-checked query: the control-plane
    listing (``catalog_scan`` — the list_objects_v2 analog, reference
    upload_data.py:48-64) decides WHICH tables exist, and the data-plane
    counts each listed table's rows through the typed ``load_table`` path.
    Output is one (table_name, n_rows) row per cataloged table — the
    reconciliation audit a store-backed warehouse runs to catch truncated
    uploads or orphaned keys.

    The oracle can only see the pre-registered table views — it cannot
    list the store — so the verifiable contract is exactly the audit's
    data half: per-table row counts.  (A per-table file count belongs in
    ``catalog_scan``-based audits where both sides read the same listing;
    emitting it here with a constant-1 oracle would make any multi-file
    table a guaranteed false mismatch.)  The catalog half is still
    exercised because the table LIST comes from the listing, not from a
    constant — an empty or extra listing changes the output rows.

    Scale shape: listing is a driver-side control-plane call (boto3 does
    the same); each count is a parquet metadata/scan aggregate; the union
    of 10 one-row aggregates is negligible.  At a 100 TB catalog the same
    plan holds — counts come from footer statistics, and the listing is
    the store index."""
    from ..io import TABLES, load_table

    keys = [k for k in list_keys(sf_dir) if k.endswith(".parquet") and "/" not in k]
    listed = {k[: -len(".parquet")] for k in keys}
    counts = None
    for t in TABLES:
        if t not in listed:
            continue
        one = load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"),
            F.count("*").alias("n_rows"),
        )
        counts = one if counts is None else counts.unionByName(one)
    if counts is None:
        raise ValueError(f"catalog listing of {sf_dir} found no tables")
    return counts.orderBy("table_name")


def catalog_table_counts_sql() -> str:
    from ..io import TABLES

    selects = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in TABLES
    )
    return f"SELECT * FROM (\n{selects}\n) ORDER BY table_name"
