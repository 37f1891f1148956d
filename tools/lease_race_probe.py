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
"""

import json
import os
import subprocess
import sys
import tempfile

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 150

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
    main()
