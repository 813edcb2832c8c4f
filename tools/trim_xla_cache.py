"""Trim the repo-committed XLA compilation cache to the small entries.

The bench's end-to-end path (model/FM init + the fused Collect+Embed step)
serializes to ~16 MB of executables; the chained ceiling/sustained programs
serialize to 50–105 MB EACH. Committing everything would bloat the repo by
~365 MB for programs the budget-gated extras can recompile in-run, so only
entries at or below ``--max-mb`` (default 20) are kept: a fresh driver
container then gets its first headline in ~100 s instead of ~140 s cold,
and the extras recompile their big programs as the 540 s budget allows.

Usage (after a chip run of bench.py):
    python tools/trim_xla_cache.py [--max-mb 20] [--dir .xla_cache]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def trim(directory: Path, max_mb: float) -> tuple[int, int]:
    kept = dropped = 0
    for f in sorted(directory.iterdir()):
        if not f.is_file():
            continue
        if f.stat().st_size > max_mb * 2**20:
            f.unlink()
            dropped += 1
        else:
            kept += 1
    return kept, dropped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mb", type=float, default=20.0)
    ap.add_argument(
        "--dir", default=str(Path(__file__).resolve().parent.parent / ".xla_cache")
    )
    args = ap.parse_args()
    directory = Path(args.dir)
    if not directory.exists():
        raise SystemExit(f"no cache at {directory}")
    kept, dropped = trim(directory, args.max_mb)
    total_mb = sum(f.stat().st_size for f in directory.iterdir() if f.is_file()) / 2**20
    print(f"kept {kept} entries ({total_mb:.1f} MB), dropped {dropped} > {args.max_mb} MB")


if __name__ == "__main__":
    main()
