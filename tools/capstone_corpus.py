"""Build the combined-adversarial capstone corpus and print its path.

Every table simultaneously adversarial: unicode/degenerate documents,
tie-heavy boundary events, edge-value transactions (customer/orders/
lineitem), exact-tie/zero-dot embeddings, grammar-hostile part names —
assembled from the SAME builders the per-family pytest parametrizations
use (tests/test_adversarial_corpus.py), so the capstone stays in sync
with the families as they grow.

Usage:
    python tools/capstone_corpus.py [out_dir]      # build, print path
    python tools/check.py $(python tools/capstone_corpus.py) [--bitwise]
    python tools/capstone_corpus.py --seed N [out_dir]
        # seed rotation: the documents table is replaced by the seeded
        # random-unicode generator and orders/lineitem/part by the seeded
        # random-relational generator (both shared with the pytest fuzz
        # fixtures) instead of the hand-crafted adversarial sets — a fresh
        # seed hunts divergences the fixed sets can't.  Embeddings and
        # events keep their hand-crafted adversarial layers (no seeded
        # generator exists for them).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class _Factory:
    """Minimal stand-in for pytest's tmp_path_factory."""

    def __init__(self, base: Path):
        self.base = base
        self._n = 0

    def mktemp(self, name: str) -> Path:
        self._n += 1
        p = self.base / f"{name}{self._n}"
        p.mkdir(parents=True)
        return p


def build(out_dir: str | None = None, seed: int | None = None) -> str:
    out = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(prefix="capstone_"))
    out.mkdir(parents=True, exist_ok=True)
    work = _Factory(out / "_parts")

    import tests.test_adversarial_corpus as T

    docs_dir = T.fuzz_dir.__wrapped__(work)
    emb_dir = T.fuzz_emb_dir.__wrapped__(work)
    txn_dir = T.fuzz_txn_dir.__wrapped__(work)
    part_dir = T.fuzz_part_dir.__wrapped__(work)

    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    if seed is None:
        shutil.copy(f"{docs_dir}/documents.parquet", out / "documents.parquet")
    else:
        import pandas as pd

        pd.DataFrame(T.random_unicode_doc_rows(seed)).to_parquet(
            out / "documents.parquet"
        )
    shutil.copy(f"{emb_dir}/embeddings.parquet", out / "embeddings.parquet")
    for t in ("customer", "orders", "lineitem"):
        shutil.copy(f"{txn_dir}/{t}.parquet", out / f"{t}.parquet")
    shutil.copy(f"{part_dir}/part.parquet", out / "part.parquet")
    if seed is not None:
        # seeded rotation also randomizes the relational stack (overwrites
        # orders/lineitem/part; customer stays the stock sf0.001 table,
        # referentially consistent with the seeded orders — the adversarial
        # customer fixture is a separate corpus this builder does not use)
        T.write_random_relational(out, seed=seed + 1)
    ev_rows = T._adversarial_events_rows()
    if seed is not None:
        # third randomized axis (round 11): seeded random events UNIONed
        # with the adversarial edge rows (ids 10000+ vs <=1502 — unique
        # event_id preserved, the documented build_checkins invariant)
        ev_rows = ev_rows + T.random_event_rows(seed + 2)
    T._write_events(str(out), ev_rows)
    shutil.rmtree(out / "_parts")
    return str(out)


if __name__ == "__main__":
    args = sys.argv[1:]
    seed = None
    if "--seed" in args:
        i = args.index("--seed")
        # validate the operand like bench.py's --reps: a trailing flag or a
        # non-integer must print usage, not a bare traceback.  A strict
        # regex, not lstrip("-").isdigit(): that accepted "--5", which
        # int() then rejects with the traceback this guard exists to stop
        # (round-11 ADVICE).
        import re

        if i + 1 >= len(args) or not re.fullmatch(r"-?\d+", args[i + 1]):
            print(
                "usage: capstone_corpus.py [OUT_DIR] [--seed N]  (N an integer)",
                file=sys.stderr,
            )
            sys.exit(2)
        seed = int(args[i + 1])
        del args[i : i + 2]
    print(build(args[0] if args else None, seed=seed))
