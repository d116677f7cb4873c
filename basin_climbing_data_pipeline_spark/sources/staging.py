"""Per-source staging layer: the reference's store catalog as a declarative
Spark pipeline.

The reference materializes ~70 staging CSVs under per-source prefixes in an
object store (``data_pipeline/config.py:29-142`` — ``capitan/*``,
``stripe/*``, ``quickbooks/*``, ``customers/*``, ``analytics/*``, …), each
written by its fetcher or builder on the nightly run
(``run_daily_pipeline.py``), with first-of-month immutable snapshots under
``<family>/snapshots/*`` (``pipeline_handler.py:343-354``,
``snapshot_day_of_month`` at ``config.py:141``).  The engine's earlier
rounds genericized the FETCHERS (paginated/cursor scans, readers); what
this module adds is the missing LAYER: the catalog itself — which staging
tables exist, which family prefix each lands under, which get snapshots —
and the orchestration that runs it as one declarative pass.

Design, Spark-first:

* **The catalog is data, not code paths.**  ``STAGING_CATALOG`` maps each
  staging table to (family prefix, builder, snapshot policy).  Builders
  are the engine's existing operators — exactly as the reference's staging
  CSVs are its builders' outputs landed to the store — so the layer adds
  layout and lifecycle, never a second implementation of the transforms.
* **Control plane vs data plane.**  ``run_staging`` walks the catalog on
  the driver (the store index side, like boto3), while every build and
  write is a distributed Spark job.  Independent tables land concurrently
  from one thread pool; Spark's scheduler interleaves their stages.
* **Snapshots are the engine's snapshot sink** (S3,
  ``operators/incremental.py:write_snapshot``): immutable, date-stamped,
  written only when the run date hits ``SNAPSHOT_DAY_OF_MONTH`` — the
  reference's monthly-snapshot contract, applied uniformly instead of 30
  hand-written snapshot paths.
* **Reconciliation closes the loop**: ``staging_reconciliation`` re-lists
  the store with the S7 catalog scan and checks every catalog entry landed
  non-empty — the audit the reference runs implicitly by crashing on a
  missing CSV, made explicit.

Why ~20 tables and not 70: the reference's count is dominated by (a) one
``snapshots/`` twin per table — systematic here via the snapshot policy —
and (b) per-SaaS raw feeds (GA4, Klaviyo, Twilio, Shopify, …) whose
mechanics are the two generic ingestion scans (S4/S5) under test
elsewhere; the driver corpus carries no analog content for them.  Every
staging family that HAS corpus-derivable content is present below.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import write_table
from ..operators.incremental import write_snapshot

# first-of-month immutable snapshots (reference config.py:141)
SNAPSHOT_DAY_OF_MONTH = 1

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class StagingTable:
    """One catalog row: where the table lands and how it is built.

    ``family`` is the store prefix (the reference's per-source dirs);
    ``snapshot`` marks tables with a monthly immutable twin (the
    reference snapshots state-like tables — rosters, balances — not
    append-only event feeds)."""

    name: str
    family: str
    builder: Builder
    snapshot: bool = False


def _catalog() -> tuple[StagingTable, ...]:
    # builders imported lazily so importing this module never drags the
    # whole operator surface in (mirrors registry.py's import discipline)
    from ..operators import cohorts as co
    from ..operators import customers as cu
    from ..operators import events as ev
    from ..operators import experiments as ex
    from ..operators import flags as fl
    from ..operators import leads as ld
    from ..operators import linking as lk
    from ..operators import memberships as mem
    from ..operators import transactions as txn

    return (
        # transactions store (reference transactions/*.csv)
        StagingTable("combined_transaction_data", "transactions", txn.build_transactions, snapshot=True),
        StagingTable("expense_categories", "accounting", txn.expense_categories, snapshot=True),
        StagingTable("suspicious_price_bands", "accounting", txn.suspicious_price_bands),
        # membership system (reference capitan/*.csv)
        StagingTable("memberships", "membership_system", mem.build_memberships, snapshot=True),
        StagingTable("memberships_2024", "membership_system", mem.build_memberships_2024, snapshot=True),
        StagingTable("checkins", "membership_system", ev.build_checkins),
        StagingTable("membership_revenue_projection", "membership_system", mem.revenue_projection, snapshot=True),
        StagingTable("at_risk_members", "membership_system", lk.at_risk_report, snapshot=True),
        # customers store (reference customers/*.csv)
        StagingTable("customer_master_v2", "customers", ld.customer_master, snapshot=True),
        StagingTable("customers", "customers", cu.build_customers, snapshot=True),
        StagingTable("customer_identifiers", "customers", cu.identifiers_build, snapshot=True),
        StagingTable("family_relationships", "customers", cu.family_relationships),
        StagingTable("customer_flags", "customers", fl.build_flags, snapshot=True),
        StagingTable("customer_events", "customers", fl.events_unified),
        # analytics store (reference analytics/*.csv)
        StagingTable("conversion_cohorts", "analytics", co.conversion_cohorts),
        StagingTable("day_pass_visit_numbers", "analytics", ev.visit_numbers),
        # leads / marketing (reference leads + mailchimp/sendgrid builds)
        StagingTable("leads_table", "marketing", ld.leads_table, snapshot=True),
        StagingTable("lead_timelines", "marketing", ld.lead_timelines),
        # experiments store (reference experiments/*.csv)
        StagingTable("customer_experiment_entries", "experiments", ex.experiment_entries, snapshot=True),
    )


STAGING_CATALOG: tuple[StagingTable, ...] = _catalog()


def staging_path(store_root: str, t: StagingTable) -> str:
    return os.path.join(store_root, t.family, t.name)


def run_staging(
    spark: SparkSession,
    sf_dir: str,
    store_root: str,
    run_date: str | None = None,
    only: set[str] | None = None,
    max_workers: int = 8,
) -> DataFrame:
    """One nightly staging pass: build and land every catalog table under
    its family prefix, snapshot the snapshot-marked tables when
    ``run_date`` is the monthly snapshot day, and return the run manifest
    as a DataFrame (table_name, family, n_rows, snapshotted) — the
    control-plane log the reference scatters across print statements.

    Writes are idempotent (overwrite mode), so a re-run converges instead
    of duplicating — the property the reference gets from re-uploading
    whole CSVs."""
    import datetime as dt

    tables = [t for t in STAGING_CATALOG if only is None or t.name in only]
    snap_due = False
    if run_date is not None:
        snap_due = dt.date.fromisoformat(run_date).day == SNAPSHOT_DAY_OF_MONTH

    def land(t: StagingTable) -> tuple[str, str, int, bool]:
        df = t.builder(spark, sf_dir)
        path = staging_path(store_root, t)
        write_table(df, path)
        landed = spark.read.parquet(path)
        took_snapshot = bool(snap_due and t.snapshot)
        if took_snapshot:
            write_snapshot(
                landed,
                os.path.join(store_root, t.family, "snapshots", t.name),
                run_date,
            )
        return (t.name, t.family, landed.count(), took_snapshot)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        rows = list(pool.map(land, tables))
    return spark.createDataFrame(
        rows, "table_name string, family string, n_rows long, snapshotted boolean"
    ).orderBy("family", "table_name")


def staging_reconciliation(spark: SparkSession, store_root: str) -> DataFrame:
    """S7-powered audit of a staged store: list the store, and for every
    catalog entry report whether its table landed and how many rows it
    holds.  ``status`` is MISSING / EMPTY / OK — the explicit version of
    the reference's crash-on-missing-CSV contract."""
    rows = []
    for t in STAGING_CATALOG:
        path = staging_path(store_root, t)
        if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            rows.append((t.name, t.family, 0, "MISSING"))
            continue
        n = spark.read.parquet(path).count()
        rows.append((t.name, t.family, n, "OK" if n > 0 else "EMPTY"))
    return spark.createDataFrame(
        rows, "table_name string, family string, n_rows long, status string"
    ).orderBy("family", "table_name")


def list_snapshots(store_root: str) -> list[str]:
    """Relative paths of every snapshot partition in the store — the
    listing the reference's snapshot-restore tooling starts from."""
    out = []
    for dirpath, dirnames, _files in os.walk(store_root):
        for d in dirnames:
            if d.startswith("snapshot_date="):
                rel = os.path.relpath(os.path.join(dirpath, d), store_root)
                out.append(rel.replace(os.sep, "/"))
    return sorted(out)
