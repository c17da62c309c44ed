"""Executor-side tombstone masking for raw-storage indexes.

Deleted docs' postings remain immutable bytes in old segments until
``compact()`` physically drops them; the query paths mask decoded doc
ids against the delete set. Round 4 held that set as a DRIVER-collected
sorted array re-broadcast per index handle (~8 B/deleted doc of driver
memory plus one full copy shipped to every executor whether its tasks
touch a deleted segment or not) — fine to ~10^8 deletes, a driver
bottleneck well before the 10^12-doc design point. This module removes
the driver from the path entirely:

* the refresh PUBLISHES tombstones partitioned by the segment that
  physically holds each deleted doc's postings
  (``tombstones_rK/seg=N/``, written by
  ``streaming/compressed.py``) — the delete set of one segment is one
  small parquet dir on the same shared storage as the index itself;
* decode tasks load ONLY the segments their block rows reference,
  lazily, through a per-executor-process cache keyed by the tombstone
  dir (revision dirs are immutable; an mtime token guards the rev-0
  overwrite case) — resident memory per executor is bounded by the
  delete sets of the segments it actually decodes, not the corpus;
* per segment the mask structure is chosen adaptively: a dense delete
  set becomes a byte-mask over its [lo, hi] id span (O(1) membership
  per posting), a sparse one stays a sorted id array (one
  ``searchsorted`` pass) — whichever is smaller within 2×.

Paths are read with pyarrow directly (no Spark job inside a UDF); on a
real cluster the index dir lives on shared storage (HDFS/S3) where
pyarrow's filesystem layer resolves the same paths.

Reference parity: neural-cherche has no deletes (``retrieve/bm25.py``
``add()`` only grows); this is the Iceberg positional-delete analogue
the incremental-index story needs at scale.
"""

from __future__ import annotations

import os

import numpy as np

# (dir, mtime_token) -> {"seg_layout": bool, "seg_ids": set[int],
#                        "segs": {seg: structure}, "all": structure}
# structure: ("dense", lo, bytemask) | ("sparse", sorted_ids) | "empty"
_CACHE: dict = {}


def _read_ids(path: str) -> np.ndarray:
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["doc_id"])
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    return np.sort(np.asarray(ids, dtype=np.int64))


def _structure(ids: np.ndarray):
    if ids.size == 0:
        return "empty"
    lo, hi = int(ids[0]), int(ids[-1])
    span = hi - lo + 1
    # byte-mask costs 1 B/slot vs 8 B/id for the sorted array: dense
    # delete sets (the common compaction-pressure case — a whole batch
    # of contiguous ids deleted) get O(1) membership at ≤ 2× the memory
    if span <= 16 * ids.size:
        m = np.zeros(span, dtype=bool)
        m[ids - lo] = True
        return ("dense", lo, m)
    return ("sparse", ids)


def _mask_one(st, d: np.ndarray) -> np.ndarray:
    """keep-mask (True = live) for decoded doc ids vs one structure."""
    if st == "empty" or st is None:
        return np.ones(d.size, dtype=bool)
    if st[0] == "dense":
        lo, m = st[1], st[2]
        idx = d - lo
        inb = (idx >= 0) & (idx < m.size)
        hit = np.zeros(d.size, dtype=bool)
        hit[inb] = m[idx[inb]]
        return ~hit
    ids = st[1]
    pos = np.searchsorted(ids, d)
    hit = np.zeros(d.size, dtype=bool)
    inb = pos < ids.size
    hit[inb] = ids[pos[inb]] == d[inb]
    return ~hit


def _entry(src: str) -> dict:
    try:
        token = int(os.path.getmtime(src))
    except OSError:
        token = -1
    key = (src, token)
    e = _CACHE.get(key)
    if e is None:
        seg_ids: set[int] = set()
        names = os.listdir(src) if os.path.isdir(src) else []
        for n in names:
            if n.startswith("seg="):
                try:
                    seg_ids.add(int(n.split("=", 1)[1]))
                except ValueError:
                    pass  # __HIVE_DEFAULT_PARTITION__ etc.
        e = {
            "seg_layout": bool(seg_ids),
            "seg_ids": seg_ids,
            "segs": {},
            "all": None,
        }
        # one live entry per dir: a rev-0 overwrite invalidates by token
        for k in [k for k in _CACHE if k[0] == src and k != key]:
            del _CACHE[k]
        _CACHE[key] = e
    return e


def _all_structure(src: str, e: dict):
    if e["all"] is None:
        if e["seg_layout"]:
            parts = [
                _read_ids(os.path.join(src, f"seg={s}"))
                for s in sorted(e["seg_ids"])
            ]
            ids = (
                np.sort(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
        else:
            ids = _read_ids(src)
        e["all"] = _structure(ids)
    return e["all"]


def keep_mask(
    src: str | None, d: np.ndarray, segs: np.ndarray | None = None
) -> np.ndarray | None:
    """True where ``d[i]`` is live. ``segs`` (per-posting source
    segment, same length as ``d``) enables the per-segment load path;
    ``None`` falls back to the merged delete set (legacy flat layout,
    or callers whose rows don't carry ``seg``). Returns ``None`` when
    nothing is deleted (callers skip the fancy-index copy)."""
    if src is None or d.size == 0:
        return None
    e = _entry(src)
    if segs is None or not e["seg_layout"]:
        st = _all_structure(src, e)
        if st == "empty":
            return None
        return _mask_one(st, d)
    keep = None
    for s in np.unique(segs):
        si = int(s)
        if si not in e["seg_ids"]:
            continue  # no deletes in this segment
        st = e["segs"].get(si)
        if st is None:
            st = _structure(_read_ids(os.path.join(src, f"seg={si}")))
            e["segs"][si] = st
        if st == "empty":
            continue
        sel = segs == s
        m = _mask_one(st, d[sel])
        if not m.all():
            if keep is None:
                keep = np.ones(d.size, dtype=bool)
            keep[sel] = m
    return keep
