"""BASELINE_CAPTURED.md must exactly match the recorded artifacts.

Round-4 verdict weak #2: the table drifted from artifacts/parity/*.json
after per-row re-records.  tools/parity.py --summary is the ONLY writer;
this test regenerates the table from the artifacts and requires the
committed file to be byte-identical, so any artifact change without a
--summary re-run fails CI."""

import os
import sys

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


def test_baseline_captured_matches_artifacts():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity

    with open(os.path.join(REPO, "BASELINE_CAPTURED.md")) as fh:
        committed = fh.read()
    expected = parity._CAPTURED_HEADER + parity.summarize() + "\n"
    assert committed == expected, (
        "BASELINE_CAPTURED.md is stale vs artifacts/parity/*.json — "
        "regenerate with: python tools/parity.py --summary"
    )
