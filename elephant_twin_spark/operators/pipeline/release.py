"""Dataset releases — immutable, manifest-described snapshots of a
table, the reproducibility contract a training run needs: "which exact
bytes did model X train on?".

This generalizes the reference's index-metadata idea (S7/M2: a Thrift
``FileIndexDescriptor`` with per-file checksums guarding staleness,
`core/indexing/AbstractBlockIndexingJob.java:122-152`) from indexes to
the DATA itself: a release is a directory of parquet files plus a
``MANIFEST.json`` recording every file's (path, size, mtime), the row
count, the schema, and a content fingerprint. ``verify_release``
replays the descriptor check — any drifted byte is reported, the same
"never serve silently stale" stance as the query planner.

Layout:

    {root}/v{version}/data/*.parquet
    {root}/v{version}/MANIFEST.json

Releases never mutate: a new version is a new directory; ``latest`` is
whatever the highest version number is. Fingerprints are computed from
the file listing (size+name), not a full re-read — the same cheap proxy
the index catalog uses; pass ``content_hash=True`` for a one-pass
md5-of-sorted-row-hashes when bytes-level assurance is worth a scan.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elephant_twin_spark.sources import fsio


def _manifest_path(root: str, version: int) -> str:
    return f"{root}/v{version}/MANIFEST.json"


def publish_release(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    version: int,
    num_files: Optional[int] = None,
    content_hash: bool = False,
) -> Dict:
    """Write ``df`` as release ``v{version}`` under ``root`` and return
    the manifest dict. Refuses to overwrite an existing version
    (releases are immutable — publish the next number instead)."""
    if fsio.exists(spark, _manifest_path(root, version)):
        raise FileExistsError(f"release v{version} already exists under {root}")
    data_dir = f"{root}/v{version}/data"
    out = df.repartition(num_files) if num_files else df
    out.write.mode("error").parquet(data_dir)

    written = spark.read.parquet(data_dir)
    n_rows = written.count()
    files = sorted(
        ({"path": p.rsplit("/", 1)[-1], "bytes": s} for p, s, _ in fsio.list_data_files(spark, data_dir)),
        key=lambda d: d["path"],
    )
    manifest = {
        "version": version,
        "n_rows": n_rows,
        "n_files": len(files),
        "total_bytes": sum(f["bytes"] for f in files),
        "schema": written.schema.jsonValue(),
        "files": files,
    }
    if content_hash:
        # order-insensitive content fingerprint: xor-free, overflow-safe
        # sum of per-row md5 prefixes — one pass, no sort, no collect
        h = written.select(
            F.sum(
                F.conv(F.substring(F.md5(F.to_json(F.struct(*written.columns))), 1, 15), 16, 10).cast(
                    "decimal(38,0)"
                )
            ).alias("h")
        ).first()["h"]
        # empty release: sum() is NULL — record a real zero hash so two
        # empty snapshots compare equal by value, not by the "None" string
        manifest["content_hash"] = str(h if h is not None else 0)
    fsio.write_text(spark, _manifest_path(root, version), json.dumps(manifest, indent=2))
    return manifest


def read_manifest(spark: SparkSession, root: str, version: int) -> Dict:
    return json.loads(fsio.read_text(spark, _manifest_path(root, version)))


def latest_version(spark: SparkSession, root: str) -> Optional[int]:
    if not fsio.exists(spark, root):
        return None
    fs, jpath, _ = fsio._fs_and_path(spark, root)
    versions = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v") and name[1:].isdigit():
            versions.append(int(name[1:]))
    return max(versions) if versions else None


def read_release(spark: SparkSession, root: str, version: Optional[int] = None) -> DataFrame:
    v = latest_version(spark, root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no releases under {root}")
    return spark.read.parquet(f"{root}/v{v}/data")


def verify_release(spark: SparkSession, root: str, version: int) -> List[str]:
    """Re-list the release and compare against its manifest. Returns a
    list of violations (empty = intact): missing/extra/resized files,
    row-count drift."""
    m = read_manifest(spark, root, version)
    data_dir = f"{root}/v{version}/data"
    live = {
        p.rsplit("/", 1)[-1]: s for p, s, _ in fsio.list_data_files(spark, data_dir)
    }
    want = {f["path"]: f["bytes"] for f in m["files"]}
    out = []
    for name in sorted(set(want) - set(live)):
        out.append(f"missing file {name}")
    for name in sorted(set(live) - set(want)):
        out.append(f"unexpected file {name}")
    for name in sorted(set(want) & set(live)):
        if want[name] != live[name]:
            out.append(f"size drift {name}: {want[name]} -> {live[name]}")
    if not out:
        n = spark.read.parquet(data_dir).count()
        if n != m["n_rows"]:
            out.append(f"row count drift: {m['n_rows']} -> {n}")
    return out


def diff_manifests(a: Dict, b: Dict) -> Dict:
    """Structural diff between two release manifests: row delta, byte
    delta, schema change flag — the release-notes one-liner."""
    return {
        "rows": b["n_rows"] - a["n_rows"],
        "bytes": b["total_bytes"] - a["total_bytes"],
        "files": b["n_files"] - a["n_files"],
        "schema_changed": a["schema"] != b["schema"],
    }


def snapshot_diff(
    old_df: "DataFrame",
    new_df: "DataFrame",
    id_col: str,
    text_col: str,
) -> "DataFrame":
    """Row-level drift report between two dataset snapshots: one row per
    ``(status, n)`` with status in ``added | removed | changed |
    unchanged`` — the between-releases complement of
    :func:`diff_manifests` (which diffs FILES; this diffs CONTENT, so a
    rewritten-in-place corpus still reports honestly).

    One full-outer join keyed by id, comparing md5 content signatures —
    scale-safe: both sides reduce to (id, sig) before the join, and the
    output is 4 rows.

    added/removed are decided by ID PRESENCE (explicit side flags), not
    by signature nullness: md5(NULL text) is NULL, so the old shape
    misfiled an existing NULL-text row as "added"/"removed" (r11
    review). NULL-text rows now compare null-safely — two NULL texts
    are "unchanged", NULL vs text is "changed"."""
    from pyspark.sql import functions as F

    from elephant_twin_spark.operators.pipeline.dedup import content_signature

    o = old_df.select(
        F.col(id_col).alias("id"),
        content_signature(F.col(text_col)).alias("_sig_o"),
        F.lit(True).alias("_in_o"),
    )
    n = new_df.select(
        F.col(id_col).alias("id"),
        content_signature(F.col(text_col)).alias("_sig_n"),
        F.lit(True).alias("_in_n"),
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(F.col("_sig_o").eqNullSafe(F.col("_sig_n")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))
