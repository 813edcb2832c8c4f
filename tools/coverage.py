"""Stdlib line-coverage gate for the test suite (reference CI parity).

The reference's CI runs ``pytest --cov=semanticlens --cov-fail-under=85``
(reference Makefile ``test-cov``); pytest-cov/coverage.py are not installed
in this image, so this tool measures line coverage with CPython 3.12's
``sys.monitoring`` (PEP 669) — low overhead: locations outside the package
are DISABLE'd on first hit, and covered package locations are DISABLE'd
once seen (each line only needs one hit).

Denominator = executable lines from each module's compiled code objects
(``co_lines`` walk), the same definition coverage.py uses.

Usage::

    python tools/coverage.py [pytest args...]      # default: tests/ -q
    python tools/coverage.py --min 70 tests/ -q    # fail under 70%

Prints a per-file table + total, and one JSON line for automation.
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json

PKG = str(_repo / "semanticlens_tpu")


def executable_lines(path: Path) -> set[int]:
    """All line numbers the compiler marks executable in ``path``."""
    try:
        code = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _start, _end, line in co.co_lines():
            if line is not None:
                lines.add(line)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # the module's synthetic first line (docstring/"0" markers) stays; fine —
    # it executes on import, so it never penalizes coverage.
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=float, default=0.0, help="fail if total %% is below this")
    ap.add_argument("pytest_args", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()
    pytest_args = args.pytest_args or ["tests/", "-q"]

    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    covered: dict[str, set[int]] = {}

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(PKG):
            covered.setdefault(fn, set()).add(line)
        return mon.DISABLE  # each location only needs one hit

    mon.use_tool_id(tool, "slcov")
    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)

    import pytest

    rc = pytest.main(pytest_args)

    mon.set_events(tool, 0)
    mon.free_tool_id(tool)

    rows = []
    total_exec = total_cov = 0
    for path in sorted(Path(PKG).rglob("*.py")):
        execable = executable_lines(path)
        if not execable:
            continue
        hit = covered.get(str(path), set()) & execable
        total_exec += len(execable)
        total_cov += len(hit)
        rows.append((str(path.relative_to(_repo)), len(hit), len(execable)))

    for name, hit, ex in rows:
        print(f"{name:64s} {hit:5d}/{ex:<5d} {100.0 * hit / ex:5.1f}%")
    pct = 100.0 * total_cov / max(total_exec, 1)
    print(f"{'TOTAL':64s} {total_cov:5d}/{total_exec:<5d} {pct:5.1f}%")
    print(
        json.dumps(
            {"coverage_pct": round(pct, 2), "lines_covered": total_cov,
             "lines_executable": total_exec, "pytest_exit": int(rc)}
        )
    )
    if rc != 0:
        sys.exit(int(rc))
    if pct < args.min:
        print(f"coverage {pct:.1f}% is below --min {args.min}%", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
