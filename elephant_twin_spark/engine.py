"""Engine — the session-scoped entry point.

``Engine(spark, index_root)`` owns an index store (any Hadoop-compatible
path: local dir, HDFS, object store) and exposes the reference's full
surface as library calls:

- ``build_index`` / ``drop_index`` / ``list_indexes``   (write path, M1/S5/S7)
- ``query(table, predicate)``                            (index-pruned scan, S2/S6/I1-I3/F4)
- ``scan(table)``                                        (plain full scan, S1)
- ``verify_index``                                       (oracle harness, M5)
- ``build_text_index`` / ``text_search`` / ``text_count`` / ``text_sample``
                                                         (Lucene-module analog, T1-T8)

The two API entry points replace the reference's INDEXINGJOBFLAG mode
switch (M3, core/retrieval/BlockIndexedFileInputFormat.java:123-126).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from elephant_twin_spark.operators import build as build_mod
from elephant_twin_spark.operators import scan as scan_mod
from elephant_twin_spark.operators import text as text_mod
from elephant_twin_spark.operators import verify as verify_mod
from elephant_twin_spark.plans import expr as E
from elephant_twin_spark.sources import catalog, fsio


def _split_top_level(s: str, sep: str = ",") -> List[str]:
    """Split on ``sep`` at paren depth 0 only, respecting quoted strings
    — the projection/ORDER BY item splitter for the mini SQL front door."""
    out, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


class Engine:
    def __init__(self, spark: SparkSession, index_root: str):
        self.spark = spark
        self.index_root = index_root.rstrip("/")
        #: planning metrics of the most recent ``query`` call (M6 analog of
        #: the reference's logged bytes-ratio)
        self.last_metrics: Optional[scan_mod.ScanMetrics] = None

    # ------------------------------------------------------------- build
    def build_index(
        self,
        table_path: str,
        column: str,
        num_buckets: int = build_mod.DEFAULT_NUM_BUCKETS,
        sample_fraction: Optional[float] = None,
        overwrite: bool = True,
        **kw,
    ) -> build_mod.BuildResult:
        return build_mod.build_block_index(
            self.spark,
            table_path,
            column,
            self.index_root,
            num_buckets=num_buckets,
            sample_fraction=sample_fraction,
            overwrite=overwrite,
            **kw,
        )

    def build_indexes(self, table_path: str, columns, **kw) -> List[build_mod.BuildResult]:
        """Build several column indexes with one shared scan of the table
        (see :func:`operators.build.build_block_indexes`)."""
        return build_mod.build_block_indexes(
            self.spark, table_path, columns, self.index_root, **kw
        )

    def build_zone_index(self, table_path: str, column: str, **kw) -> build_mod.BuildResult:
        """Per-file typed min/max zone map — serves ORDERED predicates
        (> >= < <=) as well as equality; pays off on clustered columns.
        Accepts ``key_expr`` to zone an expression under a virtual name."""
        return build_mod.build_zone_index(
            self.spark, table_path, column, self.index_root, **kw
        )

    def build_bloom_index(self, table_path: str, column: str, **kw) -> build_mod.BuildResult:
        """Per-file Bloom index — O(files) storage for high-cardinality
        columns where postings would be O(keys×files); lookups may
        false-positive (residual filter keeps results exact), never
        false-negative."""
        return build_mod.build_bloom_index(
            self.spark, table_path, column, self.index_root, **kw
        )

    def drop_index(self, table_path: str, column: str, kind: str = "block") -> None:
        fsio.delete(self.spark, catalog.index_dir(self.index_root, table_path, column, kind))

    INDEX_KINDS = ("block", "bloom", "zone", "text", "ivf", "lsh")

    def _iter_descriptors(self, table_path: str):
        """Yield ``(kind, idx_dir, descriptor)`` for every readable index
        of the table — the ONE directory enumeration shared by
        :meth:`list_indexes` and :meth:`stats` (r9 review: two hand
        copies of the kind tuple + listStatus walk had already drifted
        in structure)."""
        for kind in self.INDEX_KINDS:
            base = f"{self.index_root}/{catalog.table_id(table_path)}/{kind}"
            if not fsio.exists(self.spark, base):
                continue
            fs, jpath, _ = fsio._fs_and_path(self.spark, base)
            for st in fs.listStatus(jpath):
                if not st.isDirectory():
                    continue
                idx_dir = f"{base}/{st.getPath().getName()}"
                desc = catalog.read_descriptor(self.spark, idx_dir)
                if desc is not None:
                    yield kind, idx_dir, desc

    def list_indexes(self, table_path: str) -> List[Dict]:
        return [d.to_json() for _, _, d in self._iter_descriptors(table_path)]

    def stats(self, table_path: str) -> List[Dict]:
        """Operational summary per index of the table: kind, column,
        bucket count, on-disk bytes, covered-file freshness."""
        live = fsio.list_data_files(self.spark, table_path)
        live_paths = {p for p, _, _ in live}
        out = []
        for kind, idx_dir, desc in self._iter_descriptors(table_path):
            idx_bytes = sum(s for _, s, _ in fsio.list_data_files(self.spark, idx_dir))
            fresh = desc.fresh_files(live)
            out.append(
                {
                    "kind": kind,
                    "column": desc.column,
                    "num_buckets": desc.num_buckets,
                    "index_bytes": idx_bytes,
                    "covered_files": len(desc.files),
                    "fresh_files": len(fresh),
                    "stale_or_new_files": len(live_paths - fresh),
                    "options": dict(desc.options),
                }
            )
        return out

    # ------------------------------------------------------------- query
    def query(
        self, table_path: str, predicate, distributed_threshold=None
    ) -> DataFrame:
        """Index-accelerated filter scan; reads only files whose postings
        can match, then applies the full predicate per row. ``predicate``
        is an Expr tree, a pyspark Column (residual-only), or a SQL-ish
        string like ``"event_type = 'click' AND value > 5"``.

        ``distributed_threshold`` overrides the live-file count above
        which predicate→file-set planning runs cluster-side (0 forces
        the distributed planner — used by bench.py to track that path's
        cost round-over-round)."""
        if isinstance(predicate, str):
            predicate = E.parse_predicate(predicate)
        self.last_metrics = scan_mod.ScanMetrics()
        return scan_mod.query(
            self.spark, table_path, predicate, self.index_root,
            metrics=self.last_metrics, distributed_threshold=distributed_threshold,
        )

    def count(self, table_path: str, predicate) -> int:
        """Index-only COUNT for equality/IN predicates on block-indexed
        columns (postings already store exact per-file counts — zero data
        files read); anything else falls back to ``query(...).count()``.
        Always equals the full-scan answer."""
        if isinstance(predicate, str):
            predicate = E.parse_predicate(predicate)
        self.last_metrics = scan_mod.ScanMetrics()
        return scan_mod.count(
            self.spark, table_path, predicate, self.index_root, metrics=self.last_metrics
        )

    def distinct_values(self, table_path: str, column: str) -> DataFrame:
        """Index-only DISTINCT of a block-indexed column (postings keys;
        stale files scanned). String key domain, as in the reference."""
        return scan_mod.distinct_keys(self.spark, table_path, column, self.index_root)

    def min_max(self, table_path: str, column: str):
        """Index-only (min, max) of a zone-indexed column."""
        return scan_mod.zone_min_max(self.spark, table_path, column, self.index_root)

    def sql(self, statement: str) -> DataFrame:
        """SQL front door over index-accelerated scans — the analog of the
        reference's external-engine entry point (Pig in entry point A,
        SURVEY §3.1), with SQL as the query language:

            engine.sql("SELECT event_id, ts FROM '/data/events'"
                       " WHERE event_type = 'click' AND value > 5"
                       " ORDER BY ts DESC LIMIT 100")

        The WHERE clause goes through the same pushdown negotiation as
        ``query`` (EQ/AND/OR on indexed columns prune files; the full
        predicate re-checks rows). The FROM item is a quoted table path.
        Anything beyond this grammar (joins, GROUP BY) belongs in plain
        ``spark.sql`` / DataFrame composition over ``query``'s result —
        the front door covers the reference's own query surface, which is
        exactly filter + project + order + limit."""
        import re

        m = re.match(
            r"""^\s*SELECT\s+(?P<cols>.+?)\s+FROM\s+
                (?P<q>['"])(?P<tbl>.+?)(?P=q)
                (?:\s+WHERE\s+(?P<where>.+?))?
                (?:\s+ORDER\s+BY\s+(?P<order>.+?))?
                (?:\s+LIMIT\s+(?P<limit>\d+))?\s*$""",
            statement,
            re.IGNORECASE | re.DOTALL | re.VERBOSE,
        )
        if m is None:
            raise ValueError(
                "unsupported statement (expected SELECT cols FROM '<path>' "
                f"[WHERE ...] [ORDER BY ...] [LIMIT n]): {statement!r}"
            )
        tbl = m.group("tbl")
        cols_raw = m.group("cols").strip()
        count_alias = re.match(
            r"^count\(\s*\*\s*\)(?:\s+AS\s+(?P<a>\w+))?$", cols_raw, re.IGNORECASE
        )
        if count_alias and m.group("where") and not m.group("order"):
            # COUNT(*) routes through the covering-index path: answered
            # from postings when the predicate shape allows, zero data
            # files opened (falls back to query().count() otherwise)
            n = self.count(tbl, m.group("where"))
            alias = count_alias.group("a") or "count"
            return self.spark.createDataFrame([(n,)], f"{alias} bigint")
        df = self.query(tbl, m.group("where")) if m.group("where") else self.scan(tbl)
        # top-level split only: a naive split(",") broke multi-argument
        # calls like concat(a, b) into two invalid expressions
        # (r9 review finding)
        cols = _split_top_level(m.group("cols"))
        if cols != ["*"]:
            df = df.selectExpr(*cols)
        if m.group("order"):
            from pyspark.sql import functions as F

            order_cols = []
            for item in _split_top_level(m.group("order")):
                # whole expression + optional modifiers, not item.split()[0]
                # (which silently ordered by 'a' for 'a * 2 DESC' and
                # dropped NULLS FIRST/LAST — r9 review finding)
                om = re.match(
                    r"^(?P<e>.+?)(?:\s+(?P<dir>ASC|DESC))?"
                    r"(?:\s+NULLS\s+(?P<nulls>FIRST|LAST))?\s*$",
                    item,
                    re.IGNORECASE | re.DOTALL,
                )
                expr_sql, direction, nulls = om.group("e", "dir", "nulls")
                desc = (direction or "").upper() == "DESC"
                nulls = (nulls or "").upper()
                c = F.expr(expr_sql)
                if nulls == "FIRST":
                    c = c.desc_nulls_first() if desc else c.asc_nulls_first()
                elif nulls == "LAST":
                    c = c.desc_nulls_last() if desc else c.asc_nulls_last()
                else:
                    c = c.desc() if desc else c.asc()
                order_cols.append(c)
            df = df.orderBy(*order_cols)
        if m.group("limit"):
            df = df.limit(int(m.group("limit")))
        return df

    def pushdown_info(self, table_path: str, predicate) -> Dict:
        """M4 capability negotiation: which part of ``predicate`` the
        indexes can serve (the IndexedPigLoader getPartitionKeys /
        setPartitionFilter contract as one inspectable call)."""
        if isinstance(predicate, str):
            predicate = E.parse_predicate(predicate)
        predicate = E._coerce(predicate)
        live = fsio.list_data_files(self.spark, table_path)
        indexes = scan_mod._load_all_indexes(self.spark, table_path, self.index_root, live)
        zones = scan_mod._load_indexes(self.spark, table_path, self.index_root, live, kind="zone")
        pushed = E.extract_pushable(predicate, set(indexes), set(zones))
        return {
            "indexed_columns": sorted(set(indexes) | set(zones)),
            "pushable": repr(pushed) if pushed is not None else None,
            "residual": repr(predicate),
            "total_files": len(live),
        }

    def read_byte_range(self, file_path: str, start: int, end: int) -> DataFrame:
        """S4 one-split debug scan of [start, end) in one file."""
        return scan_mod.read_byte_range(self.spark, file_path, start, end)

    def scan(self, table_path: str) -> DataFrame:
        return self.spark.read.parquet(table_path)

    def postings(self, table_path: str, column: str) -> DataFrame:
        """The sparse index itself as a DataFrame (S10)."""
        return build_mod.read_postings(
            self.spark, catalog.index_dir(self.index_root, table_path, column, "block")
        )

    # ------------------------------------------------------------ verify
    def verify_index(self, table_path: str, column: str) -> DataFrame:
        return verify_mod.index_vs_fullscan_counts(
            self.spark, table_path, column, self.index_root
        )

    def assert_index_consistent(self, table_path: str, column: str) -> int:
        return verify_mod.assert_index_consistent(
            self.spark, table_path, column, self.index_root
        )

    def verify_all(self, table_path: str) -> Dict:
        """Soundness check for every index of the table (block per-key
        counts, zone bounds, bloom no-false-negatives); returns
        {(kind, column): n_violations} — all zeros when fresh."""
        return verify_mod.verify_all(self.spark, table_path, self.index_root, self)

    # -------------------------------------------------------------- text
    def build_text_index(self, table_path: str, text_column: str, doc_id_column: str, **kw):
        return text_mod.build_text_index(
            self.spark, table_path, text_column, doc_id_column, self.index_root, **kw
        )

    def text_index(self, table_path: str, text_column: str) -> text_mod.TextIndex:
        return text_mod.TextIndex(self.spark, table_path, text_column, self.index_root)

    # --------------------------------------------------------------- ann
    def build_ann_index(self, table_path: str, vec_column: str, id_column: str, **kw) -> str:
        from elephant_twin_spark.operators import ann as ann_mod

        return ann_mod.build_ann_index(
            self.spark, table_path, vec_column, id_column, self.index_root, **kw
        )

    def ann_index(self, table_path: str, vec_column: str):
        from elephant_twin_spark.operators import ann as ann_mod

        return ann_mod.AnnIndex(self.spark, table_path, vec_column, self.index_root)

    # --------------------------------------------------------------- lsh
    def build_lsh_index(self, table_path: str, text_column: str, id_column: str, **kw) -> str:
        from elephant_twin_spark.operators import lsh as lsh_mod

        return lsh_mod.build_lsh_index(
            self.spark, table_path, text_column, id_column, self.index_root, **kw
        )

    def lsh_index(self, table_path: str, text_column: str):
        from elephant_twin_spark.operators import lsh as lsh_mod

        return lsh_mod.LshIndex(self.spark, table_path, text_column, self.index_root)

    # ------------------------------------------------------------ ingest
    def ingest(self, src_path: str, fmt: str, dst_path: str, **kw) -> str:
        """Foreign format (csv/json/text/orc/any datasource) → normalized
        parquet table, ready for indexing — the S1 plugability surface,
        paid once at ingest instead of on every scan."""
        from elephant_twin_spark.sources import ingest as ingest_mod

        return ingest_mod.ingest(self.spark, src_path, fmt, dst_path, **kw)

    # ----------------------------------------------------------- advisor
    def advise_indexes(self, table_path: str, predicates) -> List[Dict]:
        """Recommend (column → index kind) for a predicate workload —
        the M4 negotiation contract turned proactive. One profiling scan."""
        from elephant_twin_spark.operators import advisor as advisor_mod

        return advisor_mod.advise_indexes(self.spark, table_path, predicates)
