"""Byte-range interval algebra — the reference's real "join" layer.

Pure-Python kernels over sorted, disjoint ``[start, end)`` lists, used by
the scan planner to combine per-key postings below file granularity:

- :func:`union`      — I1 (BlockIndexedFileInputFormat.java:448-575)
- :func:`intersect`  — I2 (BlockIndexedFileInputFormat.java:577-640)

These run DRIVER-side on the postings of the requested keys only (never
on row data), so input size is bounded by matched-block counts. The
reference's parallelism guard (refuse to merge unions beyond
splitMaxSize) is unnecessary here: we never rewrite Spark's splits, we
only FILTER them by overlap, so pruning granularity cannot reduce
parallelism.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

Range = Tuple[int, int]

#: sentinel meaning "the whole file must be scanned" (stale/not-covered)
WHOLE_FILE: List[Range] = [(0, 1 << 62)]


def normalize(ranges: Sequence[Range]) -> List[Range]:
    """Sort and merge overlapping/adjacent ranges into disjoint form."""
    out: List[Range] = []
    for s, e in sorted((int(s), int(e)) for s, e in ranges if e > s):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def union(a: Sequence[Range], b: Sequence[Range]) -> List[Range]:
    """I1: single-pass merge of two disjoint-sorted lists."""
    return normalize(list(a) + list(b))


def intersect(a: Sequence[Range], b: Sequence[Range]) -> List[Range]:
    """I2: emit [max(starts), min(ends)) for every overlapping pair —
    two-pointer pass over disjoint-sorted inputs."""
    out: List[Range] = []
    i = j = 0
    a = list(a)
    b = list(b)
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0])
        e = min(a[i][1], b[j][1])
        if s < e:
            out.append((s, e))
        if a[i][1] <= b[j][1]:
            i += 1
        else:
            j += 1
    return out


def total_length(ranges: Sequence[Range]) -> int:
    return sum(e - s for s, e in ranges)
