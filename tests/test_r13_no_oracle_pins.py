"""Round-over-round drift detection for the rows-only queries
(r12 verdict #6).

Six registry queries are structurally `no_oracle` — the driver gate
records a weaker rows-only check for them, so their VALUES were the
one unwitnessed corner of the registry. NO_ORACLE_HASHES.json (written
by tools/pin_no_oracle.py) records their sf0.01 canonical hashes; this
test replays each query in the shared session and compares, turning
value drift in any of the six into a red test.

The canonical form is check_oracle.canon — column-sorted, row-sorted,
bit-exact float bytes — and every registry query is partition-count /
AQE / input-split invariant per tools/determinism_check.py, so the
hash is stable across session shapes (the pins were generated at
shuffle=32, this suite runs at 8).

If a pin mismatches after an INTENTIONAL semantics change, regenerate
with `python tools/pin_no_oracle.py` and say why in the commit.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

PIN_PATH = os.path.join(REPO, "NO_ORACLE_HASHES.json")


def _pins():
    with open(PIN_PATH) as fh:
        return json.load(fh)


def test_pin_file_covers_exactly_the_no_oracle_set():
    import __spark_entry__ as entrymod

    declared = set(entrymod.queries()) - set(entrymod.oracle_sql())
    pinned = set(_pins()["queries"])
    assert pinned == declared, (
        f"NO_ORACLE_HASHES.json out of sync with the registry: "
        f"missing={sorted(declared - pinned)} stale={sorted(pinned - declared)} "
        "— regenerate with tools/pin_no_oracle.py"
    )


@pytest.mark.parametrize(
    "name", sorted(json.load(open(PIN_PATH))["queries"]) if os.path.exists(PIN_PATH) else []
)
def test_no_oracle_query_matches_pinned_hash(spark, name):
    import __spark_entry__ as entrymod
    from pin_no_oracle import canonical_hash

    pins = _pins()
    pdf = entrymod.queries()[name](spark, pins["sf_dir"]).toPandas()
    rec = pins["queries"][name]
    assert sorted(pdf.columns) == rec["columns"], name
    assert len(pdf) == rec["rows"], (name, len(pdf), rec["rows"])
    got = canonical_hash(pdf)
    assert got == rec["hash"], (
        f"{name}: canonical hash drifted ({got} != {rec['hash']}). If the "
        "change is intentional, regenerate tools/pin_no_oracle.py and "
        "explain the semantics change in the commit message."
    )
