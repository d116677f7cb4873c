"""Scale-factor rotation corpus (round-10 verdict order #4, second half).

The capstone rotations randomize VALUES at a fixed scale; this builds a
corpus at a DIFFERENT scale — a referentially consistent 2× replica of
sf0.01 ("sf0.02") via scale_probe's deterministic replica constructor — so
a full `tools/check.py <dir> --bitwise` sweep on it catches any
row-count-sensitive canon assumption (a hard-coded k, a quantile index, a
grid size) that every fixed-SF sweep would keep green.

Usage: python tools/sf_rotation.py [OUT_DIR] [--replicas N] [--base DIR]
Prints the corpus dir (build it once, sweep it with check.py).
"""

from __future__ import annotations

import os
import sys
import tempfile


def build(out_dir: str | None, replicas: int = 2, base: str = "/root/testdata/sf0.01") -> str:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools import scale_probe

    out = out_dir or tempfile.mkdtemp(prefix=f"basin_sf_rot_{replicas}x_")
    os.makedirs(out, exist_ok=True)
    prev = scale_probe.BASE
    scale_probe.BASE = base
    try:
        scale_probe.build_scaled(out, replicas)
    finally:
        scale_probe.BASE = prev
    return out


if __name__ == "__main__":
    args = sys.argv[1:]

    def _opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            if i + 1 >= len(args):
                print(
                    "usage: sf_rotation.py [OUT_DIR] [--replicas N] [--base DIR]",
                    file=sys.stderr,
                )
                sys.exit(2)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    reps = _opt("--replicas", "2")
    base_dir = _opt("--base", "/root/testdata/sf0.01")
    if not reps.isdigit() or int(reps) < 2:
        print("--replicas must be an integer >= 2", file=sys.stderr)
        sys.exit(2)
    print(build(args[0] if args else None, replicas=int(reps), base=base_dir))
