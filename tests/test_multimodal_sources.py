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


def test_decode_image_fake_contract():
    payload = b"hello world, this is a fake image payload"
    img = mm.decode_image(payload)
    checksum = sum(payload) % 1_000_000_007
    assert img["width"] == checksum % 640 + 1
    assert img["height"] == checksum % 480 + 1
    assert len(img["pixels"]) == img["width"] * img["height"]
    # pixels tile the payload, so the prefix must equal the payload itself
    assert bytes(img["pixels"][: len(payload)]) == payload
    assert mm.decode_image(payload) == img  # deterministic
    empty = mm.decode_image(b"")
    assert len(empty["pixels"]) == empty["width"] * empty["height"]


def test_sample_frames_stride_and_padding():
    payload = bytes(range(200))  # 4 frames: 64+64+64+8
    frames = mm.sample_frames(payload, every_n=1)
    assert len(frames) == 4
    assert all(len(f) == 64 for f in frames)
    assert frames[0] == payload[:64]
    assert frames[3] == payload[192:].ljust(64, b"\x00")
    assert mm.sample_frames(payload, every_n=2) == frames[::2]
    assert mm.sample_frames(b"", every_n=1) == [b"\x00" * 64]
    with pytest.raises(ValueError):
        mm.sample_frames(payload, every_n=0)


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


def test_list_keys_and_catalog_scan(spark, tmp_path):
    (tmp_path / "tables" / "t1").mkdir(parents=True)
    (tmp_path / "tables" / "t2").mkdir()
    (tmp_path / "tables" / "t1" / "part-0.parquet").write_bytes(b"x" * 10)
    (tmp_path / "tables" / "t1" / "part-1.parquet").write_bytes(b"y" * 20)
    (tmp_path / "tables" / "t2" / "part-0.parquet").write_bytes(b"z" * 5)
    (tmp_path / "manifest.json").write_text("{}")
    root = str(tmp_path)
    assert readers.list_keys(root) == [
        "manifest.json",
        "tables/t1/part-0.parquet",
        "tables/t1/part-1.parquet",
        "tables/t2/part-0.parquet",
    ]
    assert readers.list_keys(root, prefix="tables/t1/") == [
        "tables/t1/part-0.parquet",
        "tables/t1/part-1.parquet",
    ]
    cat = readers.catalog_scan(spark, root, prefix="tables/")
    by_table = {
        r["tbl"]: r["total"]
        for r in cat.groupBy(F.split("key", "/")[1].alias("tbl"))
        .agg(F.sum("size_bytes").alias("total"))
        .collect()
    }
    assert by_table == {"t1": 30, "t2": 5}


def test_resize_image_nearest_neighbor():
    from basin_climbing_data_pipeline_spark.operators.multimodal import (
        THUMB_SIDE,
        decode_image,
        resize_image,
    )

    payload = b"some deterministic payload bytes for the fake decoder"
    img = decode_image(payload)
    thumb = resize_image(payload)
    assert thumb["width"] == thumb["height"] == THUMB_SIDE
    assert len(thumb["pixels"]) == THUMB_SIDE * THUMB_SIDE
    # NEAREST contract: destination (0,0) maps to source (0,0)
    assert thumb["pixels"][0] == img["pixels"][0]
    # every thumb pixel must exist at its computed source offset
    w, h = img["width"], img["height"]
    for y in range(THUMB_SIDE):
        for x in range(THUMB_SIDE):
            sy, sx = y * h // THUMB_SIDE, x * w // THUMB_SIDE
            assert thumb["pixels"][y * THUMB_SIDE + x] == img["pixels"][sy * w + sx]


def test_resize_upscale_and_downscale():
    from basin_climbing_data_pipeline_spark.operators.multimodal import resize_image

    payload = bytes(range(256))
    up = resize_image(payload, out_w=1000, out_h=2)
    assert len(up["pixels"]) == 2000
    down = resize_image(payload, out_w=1, out_h=1)
    assert len(down["pixels"]) == 1


def test_catalog_table_counts_listing_drives_table_set(spark, tmp_path):
    """The catalog audit's table set must come FROM the listing, not a
    constant: a directory holding only a subset of tables yields only
    those rows, and an empty catalog fails loudly.  The DuckDB oracle
    (fixed table views) cannot see this — it is the control-plane half
    of the audit."""
    import shutil

    import pytest as _pytest

    from basin_climbing_data_pipeline_spark.sources.readers import (
        catalog_table_counts,
    )

    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer"):
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    got = catalog_table_counts(spark, str(tmp_path)).collect()
    assert [r["table_name"] for r in got] == ["customer", "nation", "region"]
    assert all(r["n_rows"] > 0 for r in got)
    empty = tmp_path / "empty_catalog"
    empty.mkdir()
    with _pytest.raises(ValueError, match="no tables"):
        catalog_table_counts(spark, str(empty))


def test_media_frame_sample_non_ascii_oracle_parity(spark, tmp_path):
    """The frame-sample checksum is defined over utf-8 PAYLOAD BYTES; the
    DuckDB oracle must agree even when byte and character positions diverge
    (multi-byte code points) — the corpus is pure ASCII, so this pins the
    byte semantics the corpus can't exercise."""
    import duckdb
    import pandas as pd

    from basin_climbing_data_pipeline_spark.operators import multimodal as mm

    texts = [
        "héllo wörld " * 30,          # 2-byte code points straddling frames
        "日本語のテキスト" * 20,        # 3-byte code points
        "plain ascii text " * 10,
        "émoji 🎉 mix " * 25,          # 4-byte code point
        "x",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["xx"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = mm.media_frame_sample(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(mm.media_frame_sample_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # and both agree with a direct byte replay
    for t, (_, row) in zip(texts, got.iterrows()):
        b = t.encode()
        frames = [b[i : i + 64] for i in range(0, max(len(b), 1), 64)]
        assert row["n_frames"] == len(frames)
        assert row["sampled_checksum"] == sum(sum(f) for f in frames[::10])


def test_media_frame_sample_matches_python(spark, sf_dir):
    """Spark's mapInPandas frame-sample stage must agree with a direct
    Python replay over the same payloads."""
    from basin_climbing_data_pipeline_spark.io import load_table
    from basin_climbing_data_pipeline_spark.operators import multimodal as mm

    got = {r["doc_id"]: r for r in mm.media_frame_sample(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for r in docs[:25]:
        b = r["text"].encode()
        frames = [
            b[i : i + 64].ljust(64, b"\x00") for i in range(0, max(len(b), 1), 64)
        ]
        sampled = frames[::10]
        g = got[r["doc_id"]]
        assert g["n_frames"] == len(frames)
        assert g["n_sampled"] == len(sampled)
        assert g["sampled_checksum"] == sum(sum(f) for f in sampled)
