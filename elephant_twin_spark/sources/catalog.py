"""Index descriptor catalog — the ``index.indexmeta`` analog.

The reference writes one Thrift ``FileIndexDescriptor`` per indexed file
(source path + checksum + indexed fields; gen/elephanttwin.thrift:39-46,
core/indexing/AbstractBlockIndexingJob.java:122-152) and compares the stored
checksum against the live file at plan time — a mismatch means that file's
index is stale and the file is scanned fully
(core/retrieval/BlockIndexedFileInputFormat.java:338-386).

Here: one JSON descriptor per (table, column) index, listing every covered
source file with its (size, mtime) checksum. Staleness is decided per file
at query-plan time; stale/new files always full-scan (never wrong, M2).
JSON on the index store keeps the catalog storage-agnostic and humanly
auditable; at 100 TB the descriptor is ~one row per data file — still tiny
relative to data, and read once per query plan.
"""

from __future__ import annotations

import hashlib
import posixpath
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

from pyspark.sql import SparkSession

from elephant_twin_spark.sources import fsio

DESCRIPTOR_NAME = "index.indexmeta.json"
INDEX_VERSION = 1


def table_id(table_path: str) -> str:
    """Stable directory-safe id for a source table path."""
    norm = fsio.normalize_path(table_path)
    digest = hashlib.md5(norm.encode()).hexdigest()[:12]
    base = posixpath.basename(norm.rstrip("/")) or "table"
    base = base.replace(".parquet", "")
    return f"{base}-{digest}"


def index_dir(index_root: str, table_path: str, column: str, kind: str = "block") -> str:
    return posixpath.join(index_root.rstrip("/"), table_id(table_path), kind, column)


@dataclass
class IndexDescriptor:
    """Catalog row for one (table, column) index."""

    source_path: str
    column: str
    index_type: str  # 'BLOCK' (sparse postings) | 'TEXT' (term postings)
    index_version: int
    num_buckets: int
    created_ms: int
    # file path -> {"size": int, "mtime": int}
    files: Dict[str, Dict[str, int]] = field(default_factory=dict)
    options: Dict[str, str] = field(default_factory=dict)

    def to_json(self) -> Dict:
        return {
            "source_path": self.source_path,
            "column": self.column,
            "index_type": self.index_type,
            "index_version": self.index_version,
            "num_buckets": self.num_buckets,
            "created_ms": self.created_ms,
            "files": self.files,
            "options": self.options,
        }

    @staticmethod
    def from_json(d: Dict) -> "IndexDescriptor":
        return IndexDescriptor(
            source_path=d["source_path"],
            column=d["column"],
            index_type=d["index_type"],
            index_version=d["index_version"],
            num_buckets=d["num_buckets"],
            created_ms=d["created_ms"],
            files=d.get("files", {}),
            options=d.get("options", {}),
        )

    def fresh_files(self, live: List[fsio.FileStat]) -> Set[str]:
        """Files whose live (size, mtime) checksum matches the descriptor —
        only these may be pruned via the index (M2 semantics)."""
        fresh = set()
        for path, size, mtime in live:
            rec = self.files.get(path)
            if rec is not None and rec["size"] == size and rec["mtime"] == mtime:
                fresh.add(path)
        return fresh


def descriptor_path(idx_dir: str) -> str:
    return posixpath.join(idx_dir, DESCRIPTOR_NAME)


def write_descriptor(spark: SparkSession, idx_dir: str, desc: IndexDescriptor) -> None:
    fsio.write_json(spark, descriptor_path(idx_dir), desc.to_json())


def read_descriptor(spark: SparkSession, idx_dir: str) -> Optional[IndexDescriptor]:
    p = descriptor_path(idx_dir)
    if not fsio.exists(spark, p):
        return None
    try:
        return IndexDescriptor.from_json(fsio.read_json(spark, p))
    except (ValueError, KeyError) as exc:
        # a torn/corrupt descriptor (crash mid-write on a filesystem
        # where even the staged rename isn't atomic) must degrade the
        # way staleness does — no descriptor, full scan, never wrong;
        # builders treat None as rebuild-needed, which self-heals it
        # (r9 review finding: a JSONDecodeError here broke every query
        # on the table until manual deletion)
        import warnings

        warnings.warn(
            f"elephant_twin_spark: unreadable index descriptor at {p} "
            f"({exc!r}); treating the index as absent — rebuild to heal",
            RuntimeWarning,
            stacklevel=2,
        )
        return None


def make_descriptor(
    source_path: str,
    column: str,
    index_type: str,
    num_buckets: int,
    files: List[fsio.FileStat],
    options: Optional[Dict[str, str]] = None,
) -> IndexDescriptor:
    return IndexDescriptor(
        source_path=fsio.normalize_path(source_path),
        column=column,
        index_type=index_type,
        index_version=INDEX_VERSION,
        num_buckets=num_buckets,
        created_ms=int(time.time() * 1000),
        files={p: {"size": s, "mtime": m} for p, s, m in files},
        options=options or {},
    )
