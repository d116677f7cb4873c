"""Config-driven semantics: ordered keyword maps, entry-method buckets,
price bands, interval durations.

The reference drives categorization from ordered keyword dicts with
first-match-wins semantics (reference utils/stripe_and_square_helpers.py:50-92
over dicts at data_pipeline/config.py:151-231; ordering hazard documented in
SURVEY.md §4.3).  We keep that shape — ordered (keyword, value) pairs compiled
into a single chained ``when`` expression — but define our own vocabulary over
the driver's synthetic star schema (FIXTURES.md mapping: description text is
``p_name || ' ' || p_type``).
"""

from __future__ import annotations

# First-match-wins, in this exact order (both the Spark when-chain and the
# DuckDB oracle CASE are generated from this list).
REVENUE_CATEGORY_KEYWORDS: list[tuple[str, str]] = [
    ("promo", "Day Pass"),
    ("economy", "Retail"),
    ("standard", "New Membership"),
    ("medium", "Membership Renewal"),
    ("small", "Programming"),
    ("large", "Event Booking"),
]
REVENUE_CATEGORY_DEFAULT = "Other"

# sub_category from the leading adjective of p_name (first-match-wins).
SUB_CATEGORY_KEYWORDS: list[tuple[str, str]] = [
    ("cold", "winter"),
    ("blue", "gear"),
    ("old", "clearance"),
    ("new", "launch"),
    ("smal", "youth"),   # matches 'small ...' p_names
    ("larg", "adult"),
]
SUB_CATEGORY_DEFAULT = "general"

# F2 checkins realization: events.event_type -> Capitan entry_method codes
# (reference entry methods MEM/ENT/GUE/FRE/EVE,
# reference data_pipeline/build_customer_master.py:376).
ENTRY_METHOD_BY_EVENT_TYPE: dict[str, str] = {
    "view": "MEM",
    "click": "ENT",
    "signup": "GUE",
    "purchase": "EVE",
    "error": "FRE",
}

# F1 data-source bucket (reference Data Source ∈ {Stripe, Square, Shopify},
# pipeline_handler.py:103,151,238) keyed on o_orderstatus.
DATA_SOURCE_BY_ORDERSTATUS: dict[str, str] = {
    "O": "Stripe",
    "F": "Square",
    "P": "Shopify",
}

# F3 memberships realization: interval length (days) + billing frequency per
# o_orderpriority (reference frequency vocabulary,
# fetch_capitan_membership_data.py:111-204).
MEMBERSHIP_BY_PRIORITY: dict[str, tuple[int, str]] = {
    "1-URGENT": (14, "bi_weekly"),
    "2-HIGH": (30, "monthly"),
    "3-MEDIUM": (90, "prepaid_3mo"),
    "4-NOT SPECIFIED": (180, "prepaid_6mo"),
    "5-LOW": (365, "annual"),
}

# membership size from c_mktsegment (reference size ∈ solo/duo/family/corporate).
SIZE_BY_MKTSEGMENT: dict[str, str] = {
    "AUTOMOBILE": "solo",
    "BUILDING": "duo",
    "FURNITURE": "family",
    "MACHINERY": "corporate",
    "HOUSEHOLD": "family",
}
SIZE_DEFAULT = "solo"

# Suspicious-transaction price bands (reference
# data_pipeline/flag_suspicious_transactions.py:22-94: |amount - price| <= tol
# per dict of known price points).  Ours are synthetic known price points.
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("day_pass_adult", 25.0, 1.0),
    ("day_pass_youth", 18.0, 1.0),
    ("punch_pass_5", 110.0, 2.5),
    ("monthly_solo", 89.0, 2.0),
    ("monthly_family", 219.0, 5.0),
    ("gear_rental", 8.0, 0.5),
]

# Flags-engine knobs (reference customer_flags_config.py:22-42).
FLAG_TTL_DAYS = 14
PERSISTENT_FLAGS = ("active-membership", "active-prepaid-pass", "has-youth")
REFLAG_COOLDOWN_DAYS = 180
RETURNING_BREAK_DAYS = 60

# Proximity-join windows (reference build_family_relationships.py:414-416
# 5-minute family window; build_customer_interactions.py:152-154 30-minute
# interaction window).
FAMILY_PROXIMITY_SECONDS = 300
INTERACTION_PROXIMITY_SECONDS = 1800

# TLD-typo correction map (reference customer_matching.py:131-187).
TLD_TYPO_MAP: dict[str, str] = {
    ".con": ".com",
    ".cmo": ".com",
    ".cm": ".com",
    ".vom": ".com",
    ".comm": ".com",
    ".ner": ".net",
    ".nte": ".net",
    ".ogr": ".org",
}

# Expense categorization (reference categorize_expenses.py:13-38): EXACT-match
# many-to-one rollup of granular ledger categories into the two high-level
# groups the dashboard shows; everything else maps to NULL and is excluded
# (categorize_expense returns None, :40-62).  The granular vocabulary here is
# the testdata's vendor brand codes standing in for QuickBooks category strings;
# the mechanism (exact match after strip, None default) is the operator.
# 13 granular keys -> Payroll, 5 -> Marketing, mirroring the reference's
# 13/5 split; the remaining 7 vendor codes are intentionally unmapped.
EXPENSE_CATEGORY_MAPPINGS: dict[str, list[str]] = {
    "Payroll": [f"Brand#{i}" for i in range(1, 14)],
    "Marketing": [f"Brand#{i}" for i in range(14, 19)],
}

# inverted granular -> high-level lookup (first-registered wins, dict order)
EXPENSE_CATEGORY_BY_RAW: dict[str, str] = {
    raw: high
    for high, raws in EXPENSE_CATEGORY_MAPPINGS.items()
    for raw in raws
}
