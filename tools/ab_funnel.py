"""Solo A/B: funnel shapes at 10x with a planted hot key (VERDICT r10 #6).

Three shapes over the same corpus, value-equality asserted pairwise:

  rescan   — the DEFAULT (r10 shape, kept after this A/B): pass 1 full
             scan, each later pass re-reads the base table under an
             `event_type = stage_i` pushdown filter.
  pinned   — `prefilter=True`: pass 1 full scan, passes 2..n run over a
             localCheckpoint'ed later-stage frame (one extra
             pushdown-filtered read total). MEASURED SLOWER on a
             base-table input (block-manager materialization costs more
             than pruned re-reads); wins only when the input is an
             expensive derived plan.
  fold     — pre-r10 shape: ONE scan + ONE shuffle, but
             sort_array(collect_list(struct(ts, type))) buffers every
             event of a user in one aggregation buffer — the hot-key
             OOM shape the r10 review removed (safe to run here only
             because the planted hot key still fits one executor).

Corpus: sf0.1 events replicated 10x with distinct event_ids, plus a
planted hot user (id -1) holding `--hot` extra events (default 2M) in a
view/click/purchase-free type so the funnel must scan past them.

Usage: python tools/ab_funnel.py [sf_dir] [reps] [--hot N]
Run solo (bench noise discipline).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = (args[0] if args else "/root/testdata/sf0.1").rstrip("/")
REPS = int(args[1]) if len(args) > 1 else 3
HOT = 2_000_000
for a in sys.argv[1:]:
    if a.startswith("--hot"):
        HOT = int(a.split("=", 1)[1]) if "=" in a else HOT
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
STAGES = ["view", "click", "purchase"]

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from elephant_twin_spark.operators import lifecycle, sessionize  # noqa: E402
from elephant_twin_spark.sources import tables  # noqa: E402

work = "/tmp/ets_ab_funnel"
ev_path = f"{work}/events10x"
if not os.path.exists(f"{ev_path}/_SUCCESS"):
    base = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    n = base.count()
    reps10 = spark.range(10).select(F.col("id").alias("rep"))
    big = base.crossJoin(F.broadcast(reps10)).select(
        (F.col("event_id") + F.col("rep") * (n + 1)).alias("event_id"),
        "user_id",
        "ts",
        "event_type",
        "value",
    )
    # hot key: user -1, HOT events of a non-stage type (the bot-traffic
    # shape that OOMs the fold's collect_list buffer at real scale)
    hot = spark.range(HOT).select(
        (F.lit(10**12) + F.col("id")).alias("event_id"),
        F.lit(-1).cast("long").alias("user_id"),
        (F.lit("2024-01-01").cast("timestamp") + (F.col("id") % 86400)
         .cast("int").cast("string").cast("interval second")).alias("ts"),
        F.lit("heartbeat").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    big.unionByName(hot).repartition(CPUS).write.mode("overwrite").parquet(ev_path)
ev = spark.read.parquet(ev_path)
print(f"corpus rows: {ev.count():,}", file=sys.stderr)


def funnel_fold(df):
    """pre-r10 shape: one shuffle, per-user sorted collect_list fold.
    NULL users masked to 0 post-hoc for parity with the r11 semantics."""
    stages_arr = "array(" + ",".join(f"'{s}'" for s in STAGES) + ")"
    evs = df.select(
        F.col("user_id").alias("user"),
        F.struct(F.col("ts").alias("t"), F.col("event_type").alias("y")).alias("e"),
    )
    fold = f"""
    aggregate(
      sort_array(collect_list(e)),
      named_struct('stage', 0, 'last', cast(null as timestamp)),
      (acc, x) -> IF(
         acc.stage < size({stages_arr})
         AND x.y = element_at({stages_arr}, acc.stage + 1)
         AND (acc.last IS NULL OR x.t > acc.last),
         named_struct('stage', acc.stage + 1, 'last', x.t),
         acc),
      acc -> acc.stage
    )"""
    out = evs.groupBy("user").agg(F.expr(fold).alias("stage_reached"))
    return out.withColumn(
        "stage_reached",
        F.when(F.col("user").isNull(), F.lit(0)).otherwise(F.col("stage_reached")),
    )


SHAPES = {
    "rescan_default": lambda: sessionize.funnel(ev, "user_id", "ts", "event_type", STAGES),
    "pinned_prefilter": lambda: sessionize.funnel(
        ev, "user_id", "ts", "event_type", STAGES, prefilter=True
    ),
    "fold_pre_r10": lambda: funnel_fold(ev),
}

# value equality once, before timing
ref = None
for name, fn in SHAPES.items():
    with lifecycle.checkpoint_scope():
        got = {r["user"]: r["stage_reached"] for r in fn().collect()}
    if ref is None:
        ref = got
    else:
        assert got == ref, f"{name} diverges from pinned_r11"
print(f"value-equal across shapes: {len(ref):,} users", file=sys.stderr)

for name, fn in SHAPES.items():
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        with lifecycle.checkpoint_scope():
            fn().count()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: {ts}")


# ---- derived-input A/B: the prefilter=True recommendation, measured.
# Input = an EXPENSIVE derived plan (window rank over the 10x corpus),
# so every later-pass re-read recomputes the shuffle+sort lineage.
from pyspark.sql.window import Window as _W

derived = ev.withColumn(
    "_rk", F.row_number().over(_W.partitionBy("user_id").orderBy("ts", "event_id"))
).where(F.col("_rk") > 0)

DERIVED_SHAPES = {
    "derived_rescan": lambda: sessionize.funnel(derived, "user_id", "ts", "event_type", STAGES),
    "derived_prefilter": lambda: sessionize.funnel(
        derived, "user_id", "ts", "event_type", STAGES, prefilter=True
    ),
}
ref2 = None
for name, fn in DERIVED_SHAPES.items():
    with lifecycle.checkpoint_scope():
        got = {r["user"]: r["stage_reached"] for r in fn().collect()}
    if ref2 is None:
        ref2 = got
    else:
        assert got == ref2, name
for name, fn in DERIVED_SHAPES.items():
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        with lifecycle.checkpoint_scope():
            fn().count()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: {ts}")
spark.stop()
