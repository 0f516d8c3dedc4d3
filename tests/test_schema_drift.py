"""Regeneration tripwire: the live testdata must match FIXTURES.md.

A testdata regeneration that changes any physical type, column list,
or row count flips THIS test red locally - before any driver run -
with the exact drifted columns named (the r3 wipeout, had it existed
then, would have been a one-line pytest failure instead of a DNF
round). The check itself lives in tools/schema_check.py so it is also
a standalone one-command drill.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from schema_check import check, parse_fixtures  # noqa: E402


def test_fixtures_md_parses():
    schemas, counts = parse_fixtures()
    assert set(schemas) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    # every table documents at least 2 columns and all three sf counts
    for t, cols in schemas.items():
        assert len(cols) >= 2, t
    assert counts["lineitem"]["sf0.1"] == 600_000


def test_live_testdata_matches_fixtures():
    drift = check()
    assert drift == [], "\n".join(drift)
