"""Free-text grammar parsers (multi-group regex extraction).

The reference parses pass-transfer descriptions like
``'5 Climb Punch Pass from Nancy Davis (3 remaining)'`` with the grammar
``'(.+?) from ([^(]+) \\((\\d+) remaining\\)'`` plus a no-remaining-count
variant (reference parse_pass_transfers.py:79-102).  Same parser here as a
pure column expression: ``regexp_extract`` per group with NULL tolerance —
non-matching rows yield NULL fields, never errors (the reference's
errors='coerce' discipline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRANSFER_PATTERN = r"^(.+?) from ([^(]+?)(?: \((\d+) remaining\))?$"


def parse_pass_transfer(desc: Column) -> Column:
    """Struct(pass_type, purchaser_name, remaining_count, is_punch_pass)
    from a transfer description; all-NULL struct fields when no match."""
    pass_type = F.nullif(F.regexp_extract(desc, TRANSFER_PATTERN, 1), F.lit(""))
    purchaser = F.nullif(
        F.trim(F.regexp_extract(desc, TRANSFER_PATTERN, 2)), F.lit("")
    )
    remaining = F.nullif(F.regexp_extract(desc, TRANSFER_PATTERN, 3), F.lit("")).cast(
        "int"
    )
    return F.struct(
        pass_type.alias("pass_type"),
        purchaser.alias("purchaser_name"),
        remaining.alias("remaining_count"),
        F.lower(F.coalesce(pass_type, F.lit(""))).contains("punch").alias("is_punch_pass"),
    )
