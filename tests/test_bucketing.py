"""Bucketed-table join test: the 100 TB claim that bucketing lineitem and
orders by orderkey removes the big-big join shuffle, proven on the actual
physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.io import load_table
from basin_climbing_data_pipeline_spark.plans.audit import audit


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # spark.sql.warehouse.dir is static; the tables land in the session's
    # default warehouse and are dropped (CASCADE deletes the files) below
    try:
        spark.sql("CREATE DATABASE IF NOT EXISTS bucket_test")
        for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            load_table(spark, sf_dir, name).write.mode("overwrite").bucketBy(
                8, key
            ).sortBy(key).saveAsTable(f"bucket_test.{name}_b")
        li = spark.table("bucket_test.lineitem_b")
        orders = spark.table("bucket_test.orders_b")
        # disable broadcast so the join strategy is decided by bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
                "o_orderstatus"
            ).agg(F.count("*").alias("n"))
            st = audit(joined)
            # the join itself must be shuffle-free: only the final groupBy
            # exchanges data
            assert st.n_sort_merge_joins >= 1
            assert st.n_shuffle_exchanges <= 1, (
                f"bucketed join should not shuffle join inputs: {st}"
            )
            # and it must still compute the right answer
            rows = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
            plain = (
                load_table(spark, sf_dir, "lineitem")
                .join(
                    load_table(spark, sf_dir, "orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .groupBy("o_orderstatus")
                .count()
            )
            expected = {r["o_orderstatus"]: r["count"] for r in plain.collect()}
            assert rows == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucket_test CASCADE")
