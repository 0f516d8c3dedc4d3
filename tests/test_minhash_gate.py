"""The MinHash oracle self-demotion gate (r11, VERDICT r10 #3).

q_dedup_near_minhash claims the exact-pair oracle only while the
committed marker vouches for banding recall 1.0 on the exact fixture
bytes. These tests pin all three legs: (1) the recall measurement
actually detects sub-1.0 banding recall on a corpus built to defeat
8x8 banding, (2) the decision function demotes on a recall<1 marker,
a fingerprint mismatch, and a missing marker, and (3) the committed
marker is armed and consistent with the live fixtures, so the sweep
stays oracle-checked today.
"""

from __future__ import annotations

import json
import os

import pytest

from pudatalake_spark.llmops import dedup
from tests.conftest import SF_DIR


def _low_j_corpus(spark):
    """Doc pairs whose shingle Jaccard sits just above tau=0.5 but
    low enough that 8 bands x 8 rows almost surely misses: per-pair
    hit probability 1-(1-J^8)^8 ~ 4% at J~0.52, so with 40 true
    pairs the expected number of banding hits is ~1.6 and recall<1
    with probability >0.9999 (and the seeded hashes make whatever
    happens DETERMINISTIC - the assertion is on the measured value).

    Construction: base text of 100 'wXX' tokens; the twin replaces
    every second token's tail -> shared shingles ~ half, J ~ 0.5-0.55
    (shingles are 5-char windows, SHINGLE_LEN=5)."""
    rows = []
    for p in range(40):
        base = " ".join(f"w{p:02d}{i:03d}" for i in range(100))
        words = base.split(" ")
        twin = " ".join(
            w if i % 2 == 0 else f"v{p:02d}{i:03d}"
            for i, w in enumerate(words)
        )
        rows.append((2 * p, base))
        rows.append((2 * p + 1, twin))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_measure_detects_sub_one_recall(spark):
    docs = _low_j_corpus(spark)
    exact = dedup.near_jaccard_pairs(docs).count()
    assert exact >= 20, f"corpus must have true pairs, got {exact}"
    recall = dedup.measure_banding_recall(docs)
    assert recall < 1.0, (
        f"corpus built to defeat 8x8 banding still measured {recall}"
    )


def test_decision_demotes_on_bad_marker(tmp_path):
    # recall < 1.0 recorded -> demote
    p = tmp_path / "m1.json"
    p.write_text(json.dumps({"recall": 0.93, "fingerprints": {}}))
    ok, why = dedup.minhash_oracle_decision(str(p))
    assert not ok and "0.93" in why

    # fingerprint mismatch on a present fixture -> demote
    p2 = tmp_path / "m2.json"
    p2.write_text(json.dumps({
        "recall": 1.0,
        "fingerprints": {SF_DIR: "0" * 32},
    }))
    ok, why = dedup.minhash_oracle_decision(str(p2))
    assert not ok and "changed" in why

    # missing marker -> demote
    ok, why = dedup.minhash_oracle_decision(str(tmp_path / "nope.json"))
    assert not ok and "unreadable" in why

    # absent fixture dir contradicts nothing
    p3 = tmp_path / "m3.json"
    p3.write_text(json.dumps({
        "recall": 1.0,
        "fingerprints": {"/no/such/dir": "0" * 32},
    }))
    ok, _ = dedup.minhash_oracle_decision(str(p3))
    assert ok


def test_covers_demotes_unmeasured_fixture(tmp_path):
    """ADVICE r11: the decision gate is fail-open for fixtures it
    never measured; sweep drivers must use minhash_oracle_covers to
    demote the key on a NEVER-measured SF dir."""
    # committed marker covers the real fixtures
    ok, why = dedup.minhash_oracle_covers(SF_DIR)
    assert ok, why

    # a dir with a documents fixture the marker has never seen -> not
    # covered, even though the decision gate stays armed
    fake_sf = tmp_path / "sf_custom"
    fake_sf.mkdir()
    (fake_sf / "documents.parquet").write_bytes(b"PAR1fakebytesPAR1")
    ok, why = dedup.minhash_oracle_covers(str(fake_sf))
    assert not ok and "never measured" in why
    armed, _ = dedup.minhash_oracle_decision()
    assert armed  # decision alone would have let this through

    # a measured dir whose bytes changed -> not covered
    p = tmp_path / "m.json"
    p.write_text(json.dumps({
        "recall": 1.0,
        "fingerprints": {str(fake_sf): "0" * 32},
    }))
    ok, why = dedup.minhash_oracle_covers(str(fake_sf), str(p))
    assert not ok and "changed" in why

    # no documents at all -> not covered
    ok, why = dedup.minhash_oracle_covers(str(tmp_path / "empty"))
    assert not ok and "no documents" in why


def test_committed_marker_is_armed_and_current():
    """The repo ships with the oracle ARMED: the committed marker
    must record recall 1.0 and match the live fixture bytes (if this
    fails after a testdata regen, run tools/refresh_minhash_marker.py
    - that is the designed workflow, not a bug)."""
    assert os.path.exists(dedup._MARKER_PATH)
    ok, why = dedup.minhash_oracle_decision()
    assert ok, why
    assert dedup.MINHASH_ORACLE_ENABLED
    from pudatalake_spark import registry

    registry.load_all()
    assert "q_dedup_near_minhash" in registry.ORACLES
