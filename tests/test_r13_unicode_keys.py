"""Unicode key values through every pruning path (r13 review probe).

A Python/JVM disagreement in key hashing (bloom positions are computed
driver-side, sketches JVM-side) or string collation (zone min/max
bounds are compared driver-side, built JVM-side) would be a SILENT
row-loss class: bloom false negatives skip files, zone false
exclusions skip files, and no error surfaces. The probe found all
three paths exact on multi-byte, astral-plane (emoji), and
control-character keys; this test pins that so an encoding regression
in either side's hash/compare goes red.
"""

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark import Engine, col

VALS = [
    "plain",
    "café",                 # 2-byte UTF-8
    "日本語",                # 3-byte
    "\U0001F600emoji",      # astral plane (4-byte, surrogate pair in UTF-16)
    "ζεύς",
    "tab\tkey",             # control char inside a key
]


@pytest.fixture(scope="module")
def uni_table(spark, workdir):
    rows = [(i, VALS[i % len(VALS)] + str(i % 3), float(i)) for i in range(3000)]
    path = f"{workdir}/unicode_keys_tbl"
    spark.createDataFrame(rows, "id bigint, k string, v double").repartition(
        6
    ).write.mode("overwrite").parquet(path)
    return path


@pytest.mark.parametrize("kind", ["block", "bloom", "zone"])
def test_unicode_keys_prune_exactly(spark, workdir, uni_table, kind):
    eng = Engine(spark, f"{workdir}/unicode_{kind}_idx")
    getattr(eng, "build_index" if kind == "block" else f"build_{kind}_index")(
        uni_table, "k", **({"num_buckets": 4} if kind == "block" else {})
    )
    df = spark.read.parquet(uni_table)
    for probe in [v + d for v in VALS for d in ("0", "1")] + ["missing"]:
        truth = df.where(F.col("k") == probe).count()
        assert eng.query(uni_table, col("k") == probe).count() == truth, probe
    if kind == "zone":
        # range pruning across an astral-plane boundary: UTF-16
        # code-unit order (Java String.compareTo) would sort the
        # surrogate pair BELOW some BMP chars; Spark and the driver
        # planner both compare code points, and this pins it
        for lo, hi in [("caf", "日本誟"), ("a", "\U0001F600zzz"), ("tab", "tac")]:
            truth = df.where((F.col("k") >= lo) & (F.col("k") < hi)).count()
            got = eng.query(
                uni_table, (col("k") >= lo) & (col("k") < hi)
            ).count()
            assert got == truth, (lo, hi)
