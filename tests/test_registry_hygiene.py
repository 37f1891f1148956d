"""Evidence-ordering invariant for the driver contract.

The correctness driver checks exactly the FIRST 50 entries of
``queries()`` per round. A query that has never received a green row
must therefore sit inside that window, or it stays unevidenced forever
— exactly what happened to ``sessionize``/``gap_to_prev`` in rounds
1-2 (errored in r1, fixed, but filed in the tail so the fix was never
re-verified). This test turns the ordering rule into CI.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_BUDGET = 50


def _green_names() -> set:
    """Names with a green row in ANY round's CORRECTNESS file (later
    rounds deliberately don't re-check earlier green rows, so evidence
    accumulates across files). Green = hash_match (strong) or, for
    declared rows-only queries (no oracle_sql entry), a non-error row."""
    import __spark_entry__ as entrymod

    oracle_names = set(entrymod.oracle_sql())
    green = set()
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if r.get("err") == "no_oracle":
                # the driver's rows-only record: evidence iff the query
                # ran (spark_rows present) and is STILL declared
                # oracle-less (adding an oracle later re-queues it)
                if name not in oracle_names and r.get("spark_rows") is not None:
                    green.add(name)
                continue
            if r.get("err"):
                continue
            if r.get("hash_match"):
                green.add(name)
            elif name not in oracle_names and r.get("rows_match", True):
                green.add(name)
    return green


def test_unevidenced_queries_sit_in_driver_window():
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    green = _green_names()
    late_unevidenced = [
        (pos, n)
        for pos, n in enumerate(names, start=1)
        if pos > DRIVER_BUDGET and n not in green
    ]
    assert not late_unevidenced, (
        f"queries with no green CORRECTNESS row sit past position "
        f"{DRIVER_BUDGET} and will never be checked: {late_unevidenced} — "
        f"move them into the first {DRIVER_BUDGET} registry entries"
    )


def test_driver_window_fully_hash_checkable():
    """Every first-50 entry must have an oracle_sql twin (r9 verdict
    item 3): a rows-only query in the window burns a slot on evidence
    the pytest suite already provides — `streaming_windowed_rollup` sat
    there returning `no_oracle` for two rounds. Rotations must keep the
    window 50/50 hash-checkable."""
    import __spark_entry__ as entrymod

    oracle_names = set(entrymod.oracle_sql())
    window = list(entrymod.queries())[:DRIVER_BUDGET]
    rows_only = [n for n in window if n not in oracle_names]
    assert not rows_only, (
        f"rows-only queries occupy driver-window slots: {rows_only}"
    )


def test_rotation_window_prioritizes_oldest_evidence():
    """The non-pinned window slots must hold hash-green queries whose
    last driver evidence is OLDEST (r9 verdict item 2) — concretely: no
    window entry may have NEWER evidence than some oracle-backed query
    outside the window that is ≥2 rounds staler (the slack allows
    hygiene-rule pins, which sit in the window regardless of vintage).

    Vintages are computed from evidence BEFORE `_ROTATION_ROUND` — the
    rounds the rotation could actually see. The rotation round's own
    driver run freshens exactly the window entries, so counting it (or
    later rounds, until the next rotation bumps the constant) would
    flag the unchanged registry as stale-ordered (r10 review finding:
    the test went red the moment CORRECTNESS_r10.json landed)."""
    import __spark_entry__ as entrymod

    cutoff = entrymod._ROTATION_ROUND
    last = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd >= cutoff:
            continue
        with open(path) as f:
            for name, r in json.load(f).items():
                if r.get("hash_match"):
                    last[name] = rnd
    oracle_names = set(entrymod.oracle_sql())
    names = list(entrymod.queries())
    window, tail = names[:DRIVER_BUDGET], names[DRIVER_BUDGET:]
    stalest_outside = min(
        (last.get(n, 0) for n in tail if n in oracle_names), default=99
    )
    # hygiene-rule pins (semantics/oracle/hot-path changed this round)
    # occupy window slots regardless of their evidence vintage
    pins = set(getattr(entrymod, "_ROTATION_PINS", ()))
    offenders = [
        (n, last.get(n, 0))
        for n in window
        if n not in pins and last.get(n, 0) > stalest_outside + 2
    ]
    assert not offenders, (
        f"window entries with fresh evidence while r{stalest_outside}-vintage "
        f"queries wait outside: {offenders}"
    )


def test_registry_and_oracles_consistent():
    """Every oracle_sql key names a declared query, and column aliases
    exist for both sides to compare (spot structural check only)."""
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, f"oracle_sql entries without a queries() entry: {sorted(extra)}"


def test_rotation_pins_sit_in_window():
    """A declared hygiene-rule pin that is NOT in the first-50 window is
    a contradiction: the pin list exists to justify window slots."""
    import __spark_entry__ as entrymod

    window = set(list(entrymod.queries())[:DRIVER_BUDGET])
    pins = set(getattr(entrymod, "_ROTATION_PINS", ()))
    missing = pins - window
    assert not missing, f"pinned queries missing from the driver window: {missing}"


def test_rotation_fill_order_is_oldest_first():
    """COVERAGE.md §evidence-rotation, rule 2 made structural: the
    NON-PINNED window slots must be filled oldest-vintage-first — their
    evidence vintages (computed from rounds before `_ROTATION_ROUND`)
    must be non-decreasing as the window is walked. The existing
    prioritizes-oldest test bounds window-vs-outside freshness; this one
    pins the ORDER of the fill itself, so a rotation that grabs the
    right cohort but shuffles it (leaving the very oldest for "next
    round" forever at the tail boundary) still fails."""
    import __spark_entry__ as entrymod

    cutoff = entrymod._ROTATION_ROUND
    last = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd >= cutoff:
            continue
        with open(path) as f:
            for name, r in json.load(f).items():
                if r.get("hash_match"):
                    last[name] = rnd
    pins = set(getattr(entrymod, "_ROTATION_PINS", ()))
    window = list(entrymod.queries())[:DRIVER_BUDGET]
    fill = [(n, last.get(n, 0)) for n in window if n not in pins]
    out_of_order = [
        (a, b) for a, b in zip(fill, fill[1:]) if a[1] > b[1]
    ]
    assert not out_of_order, (
        f"non-pinned window slots not oldest-evidence-first: {out_of_order}"
    )
