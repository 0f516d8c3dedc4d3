"""Regeneration drill (VERDICT r4 #4): diff the LIVE testdata parquet
schemas + row counts against what FIXTURES.md records.

The r3 wipeout happened because the testdata generator re-encoded
events.ts between rounds and nothing noticed until the driver ran.
The loader now sniffs-and-normalizes (tests/test_loader_normalize.py),
and this tool closes the other half of the drill: one command that
tells you "the files no longer match the documented fixtures" BEFORE
any driver contact, naming every drifted column.

    python tools/schema_check.py            # exit 0 clean / 1 drift

A drift report is NOT necessarily a failure of the engine (the loader
normalizes ts/date/string encodings) - it means FIXTURES.md must be
re-dumped and the loader-normalize tests re-run against the new
encoding. tests/test_schema_drift.py runs this check in pytest so a
regeneration flips the suite red locally.
"""

from __future__ import annotations

import os
import re
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "FIXTURES.md")
TESTDATA = "/root/testdata"


def _normalize_type(t: str) -> str:
    """pyarrow type str -> the FIXTURES.md vocabulary."""
    t = t.strip()
    t = re.sub(r"^large_", "", t)
    m = re.match(r"list<\w+: (.+)>$", t)
    if m:
        return f"list<{_normalize_type(m.group(1))}>"
    return t


def parse_fixtures(path: str = FIXTURES):
    """Extract {table: [(col, type)]} and {table: {sf: rows}} from the
    FIXTURES.md fenced schema blocks and the row-count table."""
    text = open(path).read()
    schemas: dict[str, list[tuple[str, str]]] = {}
    for m in re.finditer(r"### (\w+)[^\n]*\n```\n(.*?)```", text, re.S):
        table, block = m.group(1), m.group(2)
        cols = []
        for line in block.splitlines():
            # continuation lines of a wrapped comment start with spaces
            # or the comment marker; schema lines start with the col name
            lm = re.match(r"^(\w+)\s+(\S+)", line)
            if lm and not line.lstrip().startswith("--"):
                cols.append((lm.group(1), lm.group(2)))
        schemas[table] = cols
    counts: dict[str, dict[str, int]] = {}
    sfs: list[str] = []
    for line in text.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if cells and cells[0] == "table":
            sfs = cells[1:]
        elif sfs and len(cells) == len(sfs) + 1 and re.match(r"^\w+$", cells[0]):
            try:
                counts[cells[0]] = {
                    sf: int(c.replace(",", "")) for sf, c in zip(sfs, cells[1:])
                }
            except ValueError:
                pass
    return schemas, counts


def check(testdata: str = TESTDATA) -> list[str]:
    """Return a list of human-readable drift findings (empty = clean)."""
    schemas, counts = parse_fixtures()
    drift: list[str] = []
    if not schemas:
        return ["FIXTURES.md: no schema blocks parsed - format changed?"]
    sf_dirs = sorted(
        d for d in os.listdir(testdata) if d.startswith("sf")
    ) if os.path.isdir(testdata) else []
    if not sf_dirs:
        return [f"{testdata}: no sf* dirs found"]
    for sf in sf_dirs:
        for table, expected in schemas.items():
            path = os.path.join(testdata, sf, f"{table}.parquet")
            if not os.path.exists(path):
                drift.append(f"{sf}/{table}: file missing")
                continue
            meta = pq.read_metadata(path)
            live = [
                (f.name, _normalize_type(str(f.type)))
                for f in pq.read_schema(path)
            ]
            if [c for c, _ in live] != [c for c, _ in expected]:
                drift.append(
                    f"{sf}/{table}: columns {[c for c, _ in live]} != "
                    f"documented {[c for c, _ in expected]}"
                )
            else:
                for (c, lt), (_, et) in zip(live, expected):
                    if lt != et:
                        drift.append(
                            f"{sf}/{table}.{c}: type {lt!r} != documented {et!r}"
                        )
            want = counts.get(table, {}).get(sf)
            if want is not None and meta.num_rows != want:
                drift.append(
                    f"{sf}/{table}: {meta.num_rows} rows != documented {want}"
                )
    return drift


def main() -> int:
    drift = check()
    if drift:
        print(f"SCHEMA DRIFT vs FIXTURES.md ({len(drift)} findings):")
        for d in drift:
            print(f"  {d}")
        print(
            "\nAction: re-dump FIXTURES.md from the live files, then run\n"
            "  python -m pytest tests/test_loader_normalize.py tests/test_schema_drift.py"
        )
        return 1
    print("schemas + row counts match FIXTURES.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
