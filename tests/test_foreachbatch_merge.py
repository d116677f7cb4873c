"""Differential test: the foreachBatch-driven window merge over overlapping
re-fetch window files equals the batch splice of the same data, and the
stateful sessionizer never moves session bounds backwards on late events."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from basin_climbing_data_pipeline_spark.io import load_table
from basin_climbing_data_pipeline_spark.streaming.foreach_merge import merge_stream


def test_foreachbatch_merge_equals_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.to_date("ts").alias("event_date"),
        "user_id",
        "event_type",
        "value",
    )
    # three OVERLAPPING re-fetch windows written as separate files — the
    # overlap rows appear in two files, so the merge must dedup by id
    src = str(tmp_path / "src")
    windows = [("2024-01-01", "2024-01-14"), ("2024-01-10", "2024-01-24"), ("2024-01-20", "2024-02-01")]
    for i, (lo, hi) in enumerate(windows):
        (
            events.filter(
                (F.col("event_date") >= F.lit(lo)) & (F.col("event_date") < F.lit(hi))
            )
            .coalesce(1)
            .withColumn("ts", F.expr("ts_us * 1000"))
            .drop("ts_us", "event_date")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .write.mode("overwrite")
            .parquet(src + f"/w{i}")
        )
    # flatten the per-window dirs into one source dir of files
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    import os

    os.makedirs(flat)
    for i in range(len(windows)):
        for j, f in enumerate(sorted(glob.glob(src + f"/w{i}/*.parquet"))):
            shutil.copy(f, os.path.join(flat, f"w{i}_{j}.parquet"))

    merged = merge_stream(spark, flat, str(tmp_path / "tgt"), "merge_sink_t")

    expected = events.filter(F.col("event_date") < F.lit("2024-02-01")).dropDuplicates(
        ["event_id"]
    )
    assert merged.count() == expected.count()
    m = {r["event_id"]: (r["ts_us"], r["event_type"]) for r in merged.collect()}
    e = {r["event_id"]: (r["ts_us"], r["event_type"]) for r in expected.collect()}
    assert m == e


class _FakeState:
    """Minimal GroupState stand-in for driving _sessionize directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_sessionize_late_event_does_not_move_bounds_backwards():
    from basin_climbing_data_pipeline_spark.streaming.stateful import (
        SESSION_GAP_US,
        _sessionize,
    )

    state = _FakeState()
    t0 = 1_700_000_000_000_000
    # batch 1: events at t0 and t0+60s -> open session [t0, t0+60s]
    list(_sessionize((1,), iter([pd.DataFrame({"ts_us": [t0, t0 + 60_000_000]})]), state))
    assert state.get == (t0, t0 + 60_000_000, 2)
    # batch 2: a LATE event 30s after t0 (within the gap, before stored end)
    list(_sessionize((1,), iter([pd.DataFrame({"ts_us": [t0 + 30_000_000]})]), state))
    start, end, n = state.get
    assert start == t0
    assert end == t0 + 60_000_000  # must NOT move backwards
    assert n == 3
    # batch 3: event beyond the gap closes the session with correct bounds
    out = list(
        _sessionize(
            (1,), iter([pd.DataFrame({"ts_us": [end + SESSION_GAP_US + 1]})]), state
        )
    )
    closed = out[0].iloc[0]
    assert closed["session_start_us"] == t0
    assert closed["session_end_us"] == t0 + 60_000_000
    assert closed["n_events"] == 3


def test_merge_stream_starts_on_empty_source_dir(spark, tmp_path):
    """A stream may be started before its producer lands any files: the
    footer peek has nothing to read, so merge_stream falls back to the
    documented EVENTS_NANOS_SCHEMA and completes with an empty table."""
    import os

    src = str(tmp_path / "empty_src")
    os.makedirs(src)
    merged = merge_stream(spark, src, str(tmp_path / "tgt"), "merge_sink_empty")
    assert merged.count() == 0


def test_delta_profile_matches_parquet(spark, sf_dir, tmp_path):
    """The ACID (Delta MERGE) profile of the window-splice sink must equal
    the versioned-parquet profile on the same overlapping-window file
    sequence.  Runs only when delta-spark is importable AND the session
    carries the Delta SQL extension; skipped otherwise.

    Recorded skip constraint (per the round-6 review's stretch item): this
    container ships neither delta-spark nor network access — ``pip
    install`` is disallowed by the environment contract and Spark's
    ivy-based ``spark.jars.packages`` fetch needs the network, so no
    in-container green run is possible.  In any environment with
    ``pip install delta-spark`` available, build the session with
    ``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension`` and
    ``spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog
    .DeltaCatalog`` and this test runs and gates the MERGE path."""
    pytest.importorskip("delta")
    if "DeltaSparkSessionExtension" not in spark.conf.get("spark.sql.extensions", ""):
        pytest.skip("session built without the Delta SQL extension")
    from basin_climbing_data_pipeline_spark.streaming.foreach_merge import (
        merge_stream_delta,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    flat = str(tmp_path / "flat")
    import os

    os.makedirs(flat)
    events.withColumn("ts", F.expr("ts_us * 1000")).drop("ts_us").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).coalesce(1).write.mode("overwrite").parquet(flat)

    parquet_merged = merge_stream(spark, flat, str(tmp_path / "tgt_pq"), "m_pq")
    delta_merged = merge_stream_delta(spark, flat, str(tmp_path / "tgt_dl"), "m_dl")
    p = sorted(tuple(r) for r in parquet_merged.collect())
    d = sorted(tuple(r) for r in delta_merged.collect())
    assert p == d


def test_delta_profile_refuses_loudly_without_dependency(spark, tmp_path):
    """Without delta-spark the ACID profile must name its fallback, not
    crash obscurely mid-stream."""
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; the refusal path is unreachable")
    except ImportError:
        pass
    from basin_climbing_data_pipeline_spark.streaming.foreach_merge import (
        merge_stream_delta,
    )

    with pytest.raises(NotImplementedError, match="merge_stream"):
        merge_stream_delta(spark, str(tmp_path), str(tmp_path / "t"), "m")


def test_merge_stream_delta_raises_without_delta(spark, tmp_path):
    """Sans delta-spark the ACID profile must fail loud and name the
    fallback — the documented contract of the recorded-skip constraint."""
    from basin_climbing_data_pipeline_spark.streaming.foreach_merge import (
        merge_stream_delta,
    )

    with pytest.raises(NotImplementedError, match="merge_stream"):
        merge_stream_delta(spark, str(tmp_path), str(tmp_path / "t"), "m_err")


def test_delta_profile_matches_parquet_under_contract_fake(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Execute the REAL merge_stream_delta code path — stream setup, batch
    dedup, bounds, and the full MERGE builder chain with its actual
    condition strings — against a contract fake of delta-spark that
    implements Delta MERGE semantics (whenMatchedUpdateAll +
    whenNotMatchedInsertAll + whenNotMatchedBySourceDelete) with plain
    DataFrame operations over a parquet store.  The real-Delta
    differential above stays the recorded skip (no delta-spark in this
    container); this fake turns 'the only engine code no test has ever
    executed' into code exercised end-to-end, with the condition strings
    evaluated by Spark itself (F.expr over the t/b aliases), and the
    output pinned equal to the driver-green versioned-parquet profile on
    the same overlapping-window file sequence."""
    import glob
    import os
    import shutil
    import sys
    import types

    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    from basin_climbing_data_pipeline_spark.streaming import foreach_merge as fm

    tbl = "_tbl"  # fake delta data lives beside the _chk checkpoint

    class FakeDeltaWriter:
        def __init__(self, df: DataFrame):
            self._df = df
            self._mode = "error"

        def mode(self, m: str):
            self._mode = m
            return self

        def save(self, path: str) -> None:
            self._df.write.mode(self._mode).parquet(os.path.join(path, tbl))

    class FakeDeltaReader:
        def __init__(self, sess):
            self._sess = sess

        def load(self, path: str) -> DataFrame:
            return self._sess.read.parquet(os.path.join(path, tbl))

    class FakeDeltaTable:
        def __init__(self, sess, path: str):
            self._sess, self._path = sess, path
            self._alias = None
            self._source = None
            self._cond = None
            self._update_all = False
            self._insert_all = False
            self._delete_cond = None

        @staticmethod
        def isDeltaTable(sess, path: str) -> bool:
            d = os.path.join(path, tbl)
            return os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d)
            )

        @classmethod
        def forPath(cls, sess, path: str):
            return cls(sess, path)

        def alias(self, a: str):
            self._alias = a
            return self

        def merge(self, source: DataFrame, cond: str):
            self._source, self._cond = source, cond
            return self

        def whenMatchedUpdateAll(self):
            self._update_all = True
            return self

        def whenNotMatchedInsertAll(self):
            self._insert_all = True
            return self

        def whenNotMatchedBySourceDelete(self, cond: str):
            self._delete_cond = cond
            return self

        def execute(self) -> None:
            assert self._update_all and self._insert_all
            t = self._sess.read.parquet(os.path.join(self._path, tbl)).alias(
                self._alias
            )
            b = self._source  # already aliased by the caller
            # update-all + insert-all => every source row lands verbatim;
            # target rows with no source match survive unless the
            # by-source delete condition (evaluated by Spark, exactly the
            # string the engine built) selects them
            t_unmatched = t.join(b, F.expr(self._cond), "left_anti")
            if self._delete_cond is not None:
                # Delta's WHEN NOT MATCHED BY SOURCE THEN DELETE deletes only
                # when the condition evaluates TRUE — a NULL condition KEEPS
                # the row.  A bare filter(~expr) would drop NULL-evaluating
                # rows (filter keeps only TRUE), silently deleting them.
                t_unmatched = t_unmatched.filter(
                    F.coalesce(~F.expr(self._delete_cond), F.lit(True))
                )
            new = b.unionByName(t_unmatched)
            rows = new.collect()  # materialize before overwriting the store
            self._sess.createDataFrame(rows, new.schema).write.mode(
                "overwrite"
            ).parquet(os.path.join(self._path, tbl))

    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)

    orig_wfmt = DataFrameWriter.format
    orig_rfmt = DataFrameReader.format
    monkeypatch.setattr(
        DataFrameWriter,
        "format",
        lambda self, source: (
            FakeDeltaWriter(self._df) if source == "delta" else orig_wfmt(self, source)
        ),
    )
    monkeypatch.setattr(
        DataFrameReader,
        "format",
        lambda self, source: (
            FakeDeltaReader(self._spark) if source == "delta" else orig_rfmt(self, source)
        ),
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.to_date("ts").alias("event_date"),
        "user_id",
        "event_type",
        "value",
    )
    # three OVERLAPPING windows, one file each (maxFilesPerTrigger=1 =>
    # batch 1 takes the initial-overwrite branch, batches 2-3 the MERGE
    # branch incl. the by-source window delete)
    src = str(tmp_path / "src")
    windows = [
        ("2024-01-01", "2024-01-14"),
        ("2024-01-10", "2024-01-24"),
        ("2024-01-20", "2024-02-01"),
    ]
    for i, (lo, hi) in enumerate(windows):
        (
            events.filter(
                (F.col("event_date") >= F.lit(lo)) & (F.col("event_date") < F.lit(hi))
            )
            .coalesce(1)
            .withColumn("ts", F.expr("ts_us * 1000"))
            .drop("ts_us", "event_date")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .write.mode("overwrite")
            .parquet(src + f"/w{i}")
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(len(windows)):
        for j, f in enumerate(sorted(glob.glob(src + f"/w{i}/*.parquet"))):
            shutil.copy(f, os.path.join(flat, f"w{i}_{j}.parquet"))

    parquet_merged = fm.merge_stream(spark, flat, str(tmp_path / "tgt_pq"), "m_pq_f")
    delta_merged = fm.merge_stream_delta(spark, flat, str(tmp_path / "tgt_dl"), "m_dl_f")
    p = sorted(tuple(r) for r in parquet_merged.collect())
    d = sorted(tuple(r) for r in delta_merged.collect())
    assert len(d) > 0
    assert p == d
