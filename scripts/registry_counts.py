#!/usr/bin/env python
"""The registry ledger counts, MACHINE-DERIVED (r11 verdict
What's-wrong #1: ROUND11_NOTES hand-wrote "223 entries (220 full
oracles)" while the importable truth was 221/218 — the audit trail
must never drift from the code again). Paste this script's one line
into round notes / COVERAGE.md; tests/test_oracle_parity.py::
test_ledger_count_line_matches_registry pins the COVERAGE.md copy."""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def counts() -> str:
    from khronus_spark import entry_queries as eq

    n = len(eq._registry)
    full = sum(1 for _, o in eq._registry.values() if o is not None)
    return (
        f"Registry count (machine-derived): {n} entries "
        f"({full} full oracles, {n - full} rows-only); "
        f"window {eq.DRIVER_WINDOW}, queued {len(eq.PENDING_NEXT_WINDOW)}"
    )


if __name__ == "__main__":
    print(counts())
