from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from basin_climbing_data_pipeline_spark.operators import multimodal as mm
from basin_climbing_data_pipeline_spark.sources import readers


def test_media_features_deterministic(spark, sf_dir):
    out1 = {tuple(r) for r in mm.media_features(spark, sf_dir).collect()}
    out2 = {tuple(r) for r in mm.media_features(spark, sf_dir).collect()}
    assert out1 == out2 and len(out1) > 0
    for r in out1:
        assert r[1] == r[2]  # meta_bytes == decoded n_bytes


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"x")
    with pytest.raises(NotImplementedError):
        mm.sample_frames(b"x")


def test_enrich_incremental_only_processes_delta(spark, sf_dir):
    media = mm.build_media_table(spark, sf_dir)
    cache = mm.decode_features(media.filter(F.col("doc_id") < 100))
    out = mm.enrich_incremental(media, cache)
    assert out.count() == media.count()
    assert out.select("doc_id").distinct().count() == media.count()


def test_csv_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], schema)
    path = str(tmp_path / "csv_table")
    readers.write_csv_table(df, path)
    back = readers.read_csv_table(spark, path, schema)
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_json_flatten_and_roster_explode(spark, tmp_path):
    rows = [
        {
            "membership_id": 1,
            "name": "family membership",
            "status": "ACT",
            "billing": {"amount": 219.0, "interval": "MON"},
            "all_customers": [
                {"customer_id": 10, "first_name": "A", "last_name": "X"},
                {"customer_id": 11, "first_name": "B", "last_name": "X"},
            ],
        },
        {
            "membership_id": 2,
            "name": "solo membership",
            "status": "END",
            "billing": {"amount": 89.0, "interval": "MON"},
            "all_customers": [
                {"customer_id": 20, "first_name": "C", "last_name": "Y"}
            ],
        },
    ]
    p = tmp_path / "m.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    flat = readers.read_membership_json(spark, str(p))
    got = {(r["membership_id"], r["billing_amount"], r["roster_size"]) for r in flat.collect()}
    assert got == {(1, 219.0, 2), (2, 89.0, 1)}
    roster = readers.explode_membership_roster(spark, str(p))
    assert roster.count() == 3
    assert {r["customer_id"] for r in roster.collect()} == {10, 11, 20}
