"""Two-JVM writer-lease contention probe.

The build lease's create-exclusive primitive
(``fsio._try_create_exclusive``) is Hadoop ``create(path,
overwrite=false)``; on RawLocalFileSystem the exists-check and the
create are not one atomic syscall, so the lease docstring documents a
narrow double-grant window. This probe MEASURES it instead of leaving
it rhetorical: two separate JVMs (two pyspark processes) race
acquire→verify→hold→re-verify→release on ONE lease scope in a tight
loop; a double-grant surfaces as a verify failure (the lease file's
owner is not the acquirer that believes it holds it).

Usage: python tools/lease_race_probe.py [iters_per_proc]
Prints one JSON line: attempts, grants, double_grants per process.

``--heartbeat-holder`` mode (r15 verdict item 6): instead of symmetric
acquire racing, one JVM HOLDS the lease with the ttl/3 heartbeat active
(short ttl, long holds — every hold spans multiple ttls) while a rival
JVM hammers stale-takeover attempts at the staleness boundary, its
clock SKEWED FORWARD by a fraction of the ttl so it judges fresh
stamps as nearly stale (the adversarial alignment for a renew landing
inside the rival's re-read→delete gap). Both journal their claims with
wall-clock intervals to one shared file; a double-grant is a rival
grant timestamped INSIDE a holder interval whose pre-release fence
PASSED (both sides believed they held simultaneously and neither
aborted). Expected: rival grants only when a beat slips past 2/3 ttl,
every such grant fenced on the holder side, double_grants == 0.

Usage: python tools/lease_race_probe.py --heartbeat-holder [holder_iters]
"""

import json
import os
import subprocess
import sys
import tempfile

HB_MODE = "--heartbeat-holder" in sys.argv[1:]
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
ITERS = int(_pos[0]) if _pos else (40 if HB_MODE else 150)

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from elephant_twin_spark.sources import fsio

scope, iters, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .appName(f"lease-race-{tag}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

grants = double = attempts = 0
lease_path = scope.rstrip("/") + "/" + fsio.BUILD_LEASE_NAME
for i in range(iters):
    attempts += 1
    try:
        owner = fsio.acquire_build_lease(spark, scope, ttl_ms=60_000)
    except fsio.BuildLeaseHeld:
        continue
    grants += 1
    # verify twice across a hold window: a double-grant means the file's
    # recorded owner is someone else while WE believe we hold it
    for _ in range(2):
        try:
            held = json.loads(fsio.read_text(spark, lease_path))
            if held.get("owner") != owner:
                double += 1
                break
        except Exception:
            double += 1
            break
        time.sleep(0.002)
    fsio.release_build_lease(spark, scope, owner)
print(json.dumps({"tag": tag, "attempts": attempts, "grants": grants,
                  "double_grants": double}), flush=True)
spark.stop()
"""


HOLDER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from elephant_twin_spark.sources import fsio

scope, iters, journal = sys.argv[1], int(sys.argv[2]), sys.argv[3]
TTL_MS = 600
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .appName("lease-hb-holder").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

holds = fenced = refused = 0
with open(journal, "a") as jf:
    for i in range(iters):
        try:
            lease = fsio.build_lease(spark, scope, ttl_ms=TTL_MS)
            t0 = time.time()
            with lease as owner:
                # hold for 2.5x the ttl: dead without the heartbeat, and
                # every hold crosses multiple staleness boundaries where
                # the skewed rival is probing
                time.sleep(TTL_MS / 1000.0 * 2.5)
                # the pre-publish fence: raises iff the lease was lost.
                # The claimed interval ends AT the fence — that is the
                # protocol's guarantee point (publish follows it); the
                # post-fence→release gap is the documented CAS-less
                # residual, not a probe failure.
                fsio.renew_build_lease(spark, scope, owner)
                t1 = time.time()
                fence = "fence_ok"
            holds += 1
        except fsio.BuildLeaseHeld:
            if time.time() - t0 > 0.1:
                fence = "fenced"   # lost mid-hold: takeover detected at the fence
                fenced += 1
                t1 = time.time()
            else:
                refused += 1       # rival currently holds; acquire refused
                jf.write(json.dumps({"ev": "refused", "t": time.time()}) + "\n")
                jf.flush()
                time.sleep(0.05)
                continue
        jf.write(json.dumps({"ev": fence, "t0": t0, "t1": t1}) + "\n")
        jf.flush()
print(json.dumps({"tag": "holder", "holds": holds, "fenced": fenced,
                  "refused": refused}), flush=True)
spark.stop()
"""

RIVAL = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from elephant_twin_spark.sources import fsio

scope, journal, stop_flag = sys.argv[1], sys.argv[2], sys.argv[3]
TTL_MS = 600
SKEW_S = 0.25  # clock runs 0.25s (~0.4 ttl) fast: fresh stamps look old
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .appName("lease-hb-rival").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# Skew THIS process's staleness judgement forward. fsio reads the clock
# via `import time as _time; _time.time()`, so patching time.time skews
# every acquire-side age computation (and our own markers' stamps —
# which only makes our leases look MORE takeable to the holder, the
# adversarial direction).
import time as _t
_real_time = _t.time
_t.time = lambda: _real_time() + SKEW_S

import os
grants = attempts = 0
with open(journal, "a") as jf:
    while not os.path.exists(stop_flag):
        attempts += 1
        try:
            owner = fsio.acquire_build_lease(spark, scope, ttl_ms=TTL_MS)
        except fsio.BuildLeaseHeld:
            continue
        grants += 1
        jf.write(json.dumps({"ev": "rival_grant", "t": _real_time()}) + "\n")
        jf.flush()
        _t.sleep(0.05)  # brief hold, then hand back
        fsio.release_build_lease(spark, scope, owner)
print(json.dumps({"tag": "rival", "attempts": attempts,
                  "grants": grants}), flush=True)
spark.stop()
"""


def main_heartbeat_holder():
    workdir = tempfile.mkdtemp(prefix="lease_hb_")
    scope = f"{workdir}/idx"
    journal = f"{workdir}/journal.jsonl"
    stop_flag = f"{workdir}/stop"
    open(journal, "w").close()
    holder = subprocess.Popen(
        [sys.executable, "-c", HOLDER, scope, str(ITERS), journal],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    rival = subprocess.Popen(
        [sys.executable, "-c", RIVAL, scope, journal, stop_flag],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    hold_out, _ = holder.communicate(timeout=1800)
    open(stop_flag, "w").close()
    rival_out, _ = rival.communicate(timeout=300)
    results = [
        json.loads(line)
        for out in (hold_out, rival_out)
        for line in out.splitlines()
        if line.strip().startswith("{")
    ]
    # double-grant: a rival grant inside a holder interval whose fence
    # PASSED — both believed they held, neither aborted
    events = [json.loads(l) for l in open(journal) if l.strip()]
    ok_intervals = [(e["t0"], e["t1"]) for e in events if e["ev"] == "fence_ok"]
    rival_grants = [e["t"] for e in events if e["ev"] == "rival_grant"]
    double = sum(
        1 for t in rival_grants if any(a <= t <= b for a, b in ok_intervals)
    )
    print(json.dumps({
        "mode": "heartbeat_holder",
        "holder_iters": ITERS,
        "results": results,
        "rival_grants": len(rival_grants),
        "holder_fence_ok_intervals": len(ok_intervals),
        "double_grants": double,
    }))


def main():
    scope = tempfile.mkdtemp(prefix="lease_race_") + "/idx"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, scope, str(ITERS), tag],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for tag in ("A", "B")
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                results.append(json.loads(line))
    total = {
        "iters_per_proc": ITERS,
        "results": results,
        "total_grants": sum(r["grants"] for r in results),
        "total_double_grants": sum(r["double_grants"] for r in results),
    }
    print(json.dumps(total))


if __name__ == "__main__":
    main_heartbeat_holder() if HB_MODE else main()
