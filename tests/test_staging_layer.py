"""Staging-layer contract: the declarative store catalog lands every
per-source table under its family prefix, snapshots on the monthly
schedule, re-runs idempotently, and the reconciliation audit notices a
hole — the reference's nightly store discipline
(run_daily_pipeline.py + config.py:29-142) as one tested pass."""

from __future__ import annotations

import os
import shutil

from basin_climbing_data_pipeline_spark.sources import staging as st

# a small catalog slice keeps the fixture fast while still crossing four
# families and both snapshot policies
SLICE = {
    "combined_transaction_data",   # transactions, snapshot
    "checkins",                    # membership_system, no snapshot
    "customer_identifiers",        # customers, snapshot
    "conversion_cohorts",          # analytics, no snapshot
}


def test_catalog_is_well_formed():
    names = [t.name for t in st.STAGING_CATALOG]
    assert len(names) == len(set(names)), "duplicate staging table names"
    assert all(t.family for t in st.STAGING_CATALOG)
    # the reference snapshots state-like tables; the catalog must carry
    # both policies or the snapshot path is untested
    assert any(t.snapshot for t in st.STAGING_CATALOG)
    assert any(not t.snapshot for t in st.STAGING_CATALOG)
    families = {t.family for t in st.STAGING_CATALOG}
    assert families >= {
        "transactions",
        "membership_system",
        "customers",
        "analytics",
        "accounting",
        "marketing",
        "experiments",
    }


def test_run_lands_every_table_and_audit_is_clean(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    manifest = {
        r["table_name"]: r
        for r in st.run_staging(
            spark, sf_dir, root, run_date="2024-03-15", only=SLICE
        ).collect()
    }
    assert set(manifest) == SLICE
    for t in st.STAGING_CATALOG:
        if t.name not in SLICE:
            continue
        path = st.staging_path(root, t)
        assert os.path.isdir(path), f"{t.name} did not land"
        assert manifest[t.name]["n_rows"] > 0
        assert manifest[t.name]["family"] == t.family
    # mid-month run: no snapshots anywhere
    assert not any(m["snapshotted"] for m in manifest.values())
    assert st.list_snapshots(root) == []
    audit = {
        r["table_name"]: r["status"]
        for r in st.staging_reconciliation(spark, root).collect()
        if r["table_name"] in SLICE
    }
    assert all(s == "OK" for s in audit.values()), audit


def test_snapshot_day_writes_immutable_twins(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    manifest = {
        r["table_name"]: r
        for r in st.run_staging(
            spark, sf_dir, root, run_date="2024-03-01", only=SLICE
        ).collect()
    }
    want_snapshot = {
        t.name for t in st.STAGING_CATALOG if t.name in SLICE and t.snapshot
    }
    got_snapshot = {n for n, m in manifest.items() if m["snapshotted"]}
    assert got_snapshot == want_snapshot
    snaps = st.list_snapshots(root)
    assert len(snaps) == len(want_snapshot)
    assert all("snapshots/" in s and "snapshot_date=2024-03-01" in s for s in snaps)
    # the snapshot carries its date column and the full table
    t = next(t for t in st.STAGING_CATALOG if t.name in want_snapshot)
    snap_df = spark.read.parquet(
        os.path.join(root, t.family, "snapshots", t.name)
    )
    assert "snapshot_date" in snap_df.columns
    assert snap_df.count() == manifest[t.name]["n_rows"]


def test_rerun_is_idempotent(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    one = {"checkins"}
    n1 = st.run_staging(spark, sf_dir, root, only=one).collect()[0]["n_rows"]
    n2 = st.run_staging(spark, sf_dir, root, only=one).collect()[0]["n_rows"]
    assert n1 == n2, "re-run duplicated rows instead of overwriting"


def test_reconciliation_flags_a_missing_table(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    st.run_staging(spark, sf_dir, root, only=SLICE)
    victim = next(t for t in st.STAGING_CATALOG if t.name == "checkins")
    shutil.rmtree(st.staging_path(root, victim))
    audit = {
        r["table_name"]: r["status"]
        for r in st.staging_reconciliation(spark, root).collect()
    }
    assert audit["checkins"] == "MISSING"
    assert all(
        audit[n] == "OK" for n in SLICE - {"checkins"}
    ), "unrelated tables must stay OK"
