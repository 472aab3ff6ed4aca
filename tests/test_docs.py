"""Docs-vs-code drift guards."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_operator_catalog_in_sync():
    """docs/OPERATORS.md must match what scripts/gen_catalog.py would
    generate from the live registry — regenerate and compare, so a new
    declared query can't ship without its catalog row."""
    catalog = REPO / "docs" / "OPERATORS.md"
    before = catalog.read_text()
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_catalog.py")],
        check=True,
        capture_output=True,
    )
    after = catalog.read_text()
    if before != after:
        catalog.write_text(before)  # leave the tree as we found it
        raise AssertionError(
            "docs/OPERATORS.md is stale — run `python scripts/gen_catalog.py`"
        )
