"""Hash-pin the rows-only registry queries (r12 verdict #6).

Six queries can never earn a driver hash (`no_oracle`: custom streaming
emission, approx sketches with no ANSI twin). Each has an exact-oracle
sibling or a batch-equality pytest pin, but nothing watched THEIR
output for drift round-over-round. This tool records their sf0.01
canonical hashes — the same bit-exact canonical form the oracle gate
uses (`check_oracle.canon`) — into NO_ORACLE_HASHES.json;
tests/test_r13_no_oracle_pins.py replays the queries and compares, so
a change in any of the six surfaces as a red test instead of silent
drift in the one unwitnessed corner of the registry.

Regenerate (after an INTENTIONAL semantics change — note it in the
commit message): python tools/pin_no_oracle.py [sf_dir]
"""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import canon  # noqa: E402

OUT_PATH = os.path.join(REPO, "NO_ORACLE_HASHES.json")


def no_oracle_names(entrymod):
    return sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


def canonical_hash(pdf) -> str:
    """md5 of the canonical (column-sorted, row-sorted, bit-exact
    float-encoded) CSV — partition-count / AQE / split invariant for
    every registry query per the determinism harness."""
    return hashlib.md5(
        canon(pdf).to_csv(index=False).encode("utf-8")
    ).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    out = {"sf_dir": sf_dir, "queries": {}}
    for name in no_oracle_names(entrymod):
        pdf = entrymod.queries()[name](spark, sf_dir).toPandas()
        out["queries"][name] = {
            "hash": canonical_hash(pdf),
            "rows": int(len(pdf)),
            "columns": sorted(pdf.columns),
        }
        print(f"pinned {name}: {out['queries'][name]}")
    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT_PATH} ({len(out['queries'])} queries)")


if __name__ == "__main__":
    main()
