"""BANDS.json structural hygiene: the bench consults it blindly, so a
typo'd key or inverted band would silently disable a key's policy or
flag every run. Pure-file checks, no Spark."""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bands():
    with open(f"{REPO}/BANDS.json") as f:
        return json.load(f)


def test_bands_keys_exist_in_bench():
    src = open(f"{REPO}/bench.py").read()
    bench_keys = set(re.findall(r'timed\(\s*\n?\s*"([^"]+)"', src))
    missing = [k for k in _bands()["keys"] if k not in bench_keys]
    assert not missing, f"BANDS.json names keys bench.py never times: {missing}"


def test_bands_are_well_formed():
    for k, pol in _bands()["keys"].items():
        band = pol.get("shared_band")
        assert band and len(band) == 2 and 0 < band[0] <= band[1], (k, band)
        solo = pol.get("solo_steady")
        if solo is not None:
            assert len(solo) == 2 and 0 < solo[0] <= solo[1], (k, solo)
        assert pol.get("policy", "min2") in ("min1", "min2", "median3"), (k, pol)
        assert "source" in pol, f"{k}: every band needs a provenance note"
    src = open(f"{REPO}/bench.py").read()
    for m, pol in _bands().get("metrics", {}).items():
        band = pol.get("band")
        assert band and len(band) == 2 and 0 < band[0] <= band[1], (m, band)
        assert "source" in pol, f"{m}: every band needs a provenance note"
        assert f'"{m}"' in src, f"{m}: bench.py never reports this metric"


def test_median3_build_keys_have_reset_in_bench():
    """A reps>1 build without a reset would time the rewrite path —
    bench.py guards this at runtime by capping reps, but a median3 BUILD
    entry whose call site forgot the reset silently degrades to rep1
    (first-touch readings return). Catch it statically."""
    src = open(f"{REPO}/bench.py").read()
    bands = _bands()["keys"]
    for k, pol in bands.items():
        if not k.startswith("build_") or pol.get("policy") != "median3":
            continue
        call = re.search(r'timed\(\s*\n?\s*"' + re.escape(k) + r'"(.*?)\)\(', src, re.S)
        assert call and "reset=" in call.group(1), (
            f"{k} is median3 but its bench.py call passes no reset"
        )


def test_bands_sf_gate_compares_numerically():
    """r11 advisor item 4, pinned: the out-of-band gate must survive
    float-formatting drift between BANDS.json's `sf` and the directory
    name — a string comparison silently disabled all triage."""
    import bench

    assert bench.bands_sf_matches("/root/testdata/sf0.1", 0.1)
    assert bench.bands_sf_matches("/root/testdata/sf0.1/", 0.1)
    assert bench.bands_sf_matches("/data/sf0.10", 0.1)   # dir formats differ
    assert bench.bands_sf_matches("/data/sf1.0", 1)       # int-recorded sf
    assert bench.bands_sf_matches("/data/sf1", 1.0)
    assert bench.bands_sf_matches("/data/sf0.1", "0.1")   # string-recorded sf
    assert not bench.bands_sf_matches("/data/sf0.01", 0.1)
    assert not bench.bands_sf_matches("/data/no_sf_here", 0.1)
    assert not bench.bands_sf_matches("/data/sf0.1", None)
    assert not bench.bands_sf_matches("/data/sf0.1", "not-a-number")
