"""Spark-free serving tier over a built index artifact.

``BM25Index.search_serving`` removes the per-call termdict job but
still runs ONE Spark job per call for the pruned postings scan — a
single query pays job scheduling + Python-worker round-trips, i.e.
hundreds of ms of fixed cost for milliseconds of scoring (measured:
p50 ≈ 770 ms at 2k docs, while the 1000-query BATCH amortizes to
~2 ms/query). That fixed cost is Spark's, not the engine's.

:class:`LocalSearcher` is the missing deployment shape: Spark builds
and refreshes the index (the 100 TB side); serving nodes open the
SAME parquet artifact directly and answer single queries with no
cluster in the loop —

* term lookup: the driver-side serving map (the exact structure
  ``prepare_serving`` builds — term → term_id/idf/buckets/n_salts;
  ~100 B/term, or workload-filtered for 10^7+-term vocabularies);
* postings read: a ``pyarrow.dataset`` scan of ``postings/`` with a
  ``bucket ∈ B ∧ term_id ∈ T`` filter — hive partition pruning picks
  the bucket directories, parquet row-group ``term_id`` min/max stats
  prune within them (the builder writes each bucket sorted by term);
* scoring: the SAME ``_bmw_group_fn`` scorer the cluster path runs
  inside ``applyInPandas`` — identical block-max pruning, subgroup
  sharding, tie-breaks — fed the identical columns from the pyarrow
  read. Parity with ``search_serving`` is therefore structural, and
  pinned end-to-end by ``tests/test_serve_local.py``.

Scope: weights-storage indexes (bm25 and tfidf — the stored weights
are final either way) and RAW-storage bm25 indexes including pending
tombstones (``index/tombmask.py`` is already pyarrow-only, so the
delete-set masking runs in-process exactly as it does inside the
cluster scorer). tfidf+raw indexes raise and point at
``search_serving`` (their exact cosine needs the post-aggregation
docnorm join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class LocalSearcher:
    """Single-process searcher over a built index artifact.

    Carries a hot-term postings LRU (``cache_bytes``, default 128 MB):
    zipfian serving workloads re-hit head terms, whose block rows are
    immutable for the manifest this handle is pinned to — a refresh
    publishes a NEW manifest, served by opening a new searcher (the
    same handle-per-snapshot rule as ``BM25Index``)."""

    def __init__(
        self,
        postings_dir: str,
        serving: dict,
        manifest,
        prepared: set | None = None,
        subgroup_cap: int = 32,
        tomb_src: str | None = None,
        cache_bytes: int = 128 << 20,
    ) -> None:
        import collections

        import pyarrow.dataset as ds

        self.manifest = manifest
        self._serving = serving
        self._serving_prepared = prepared
        self._tomb_src = tomb_src
        # hot-term postings cache: term_id → its block rows (immutable
        # for this manifest — segments are append-only and the handle
        # is pinned to one manifest). LRU by payload bytes; serving
        # workloads are zipfian, so the head terms' blocks stay
        # resident and repeat queries skip the dataset scan entirely.
        self._cache: "collections.OrderedDict[int, tuple]" = (
            collections.OrderedDict()
        )
        self._cache_bytes = 0
        self._cache_cap = int(cache_bytes)
        self.cache_misses = 0  # dataset reads (introspection/tests)
        self.storage = manifest.cfg.get("storage", "weights")
        if self.storage == "raw":
            cfg = manifest.cfg
            self._raw_cfg = (
                float(cfg["k1"]), float(cfg["b"]),
                float(cfg["epsilon"]), float(manifest.avgdl),
                cfg.get("weighting", "bm25"),
            )
        else:
            self._raw_cfg = None
        # same power-of-two rounding as search_bmw (doc-disjointness
        # needs n_groups | n_salts whenever n_salts > n_groups)
        self.subgroup_cap = 1 << (max(1, subgroup_cap).bit_length() - 1)
        # dataset handle opened once: file listing + partition
        # discovery are per-searcher, not per-query
        self._ds = ds.dataset(postings_dir, format="parquet", partitioning="hive")
        self._fields = set(self._ds.schema.names)

    # ------------------------------------------------------------------
    @classmethod
    def from_index(
        cls,
        index,
        queries: list[str] | None = None,
        subgroup_cap: int = 32,
        cache_bytes: int = 128 << 20,
    ) -> "LocalSearcher":
        """Open a searcher over a ``BM25Index`` handle's artifact.

        Uses the handle's serving map if prepared (calling
        ``prepare_serving(queries)`` otherwise — the one Spark-side
        bootstrap step); after construction no Spark session is
        touched. ``queries`` forwards the vocabulary-filtered prepare
        for huge termdicts."""
        storage = index.manifest.cfg.get("storage", "weights")
        weighting = index.manifest.cfg.get("weighting", "bm25")
        if storage == "raw" and weighting == "tfidf":
            raise NotImplementedError(
                "tfidf+raw needs the post-aggregation docnorm join — "
                "use index.search_serving()"
            )
        if not getattr(index, "salt_layout_ok", True):
            raise ValueError(
                "index predates the codec.doc_salt layout — rebuild it"
            )
        if index._serving is None:
            index.prepare_serving(queries)
        return cls(
            index.cat.path("postings"),
            index._serving,
            index.manifest,
            prepared=index._serving_prepared,
            subgroup_cap=subgroup_cap,
            tomb_src=index._tomb_src() if hasattr(index, "_tomb_src") else None,
            cache_bytes=cache_bytes,
        )

    # ------------------------------------------------------------------
    def _read_postings(self, rows: list) -> pd.DataFrame:
        """Pruned pyarrow scan: bucket dirs via hive partition pruning,
        row groups via term_id stats — the LOCAL twin of
        query/bmw._postings_for. Hot terms come from the LRU cache;
        only cache misses touch the dataset."""
        hits, misses = [], []
        for r in rows:
            t = int(r["term_id"])
            if t in self._cache:
                self._cache.move_to_end(t)
                hits.append(self._cache[t][0])
            else:
                misses.append(r)
        parts = list(hits)
        if misses:
            fresh = self._scan_postings(misses)
            parts.append(fresh)
            if self._cache_cap > 0 and len(fresh):
                payload = fresh["docs"].map(len)
                if "ws" in fresh.columns:
                    payload = payload + fresh["ws"].map(len)
                else:
                    payload = (
                        payload
                        + fresh["tfs"].map(len)
                        + fresh["dls"].map(len)
                    )
                for t, sub in fresh.groupby("term_id", sort=False):
                    nb = int(payload[sub.index].sum()) + 512
                    self._cache[int(t)] = (sub, nb)
                    self._cache_bytes += nb
                while self._cache_bytes > self._cache_cap and self._cache:
                    _, (_, nb) = self._cache.popitem(last=False)
                    self._cache_bytes -= nb
        if not parts:
            return pd.DataFrame()
        return (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
        )

    def _scan_postings(self, rows: list) -> pd.DataFrame:
        import pyarrow.dataset as ds

        self.cache_misses += 1
        buckets = sorted({int(b) for r in rows for b in r["buckets"]})
        tids = sorted(int(r["term_id"]) for r in rows)
        filt = ds.field("bucket").isin(buckets) & ds.field("term_id").isin(tids)
        if "seg" in self._fields:
            # segment-partitioned layout: read only the segments THIS
            # manifest committed (an orphan seg dir from a crashed
            # refresh must stay invisible — same rule as
            # BM25Index.postings)
            segs = [int(s["seg"]) for s in self.manifest.segments]
            filt = filt & ds.field("seg").isin(segs)
        if self.storage == "raw":
            cols = [
                "term_id", "salt", "n_salts", "n", "first_doc",
                "last_doc", "max_tf", "min_tf", "min_dl", "max_dl",
                "docs", "tfs", "dls",
            ]
        else:
            cols = [
                "term_id", "salt", "n", "first_doc", "last_doc",
                "max_w", "min_w", "docs", "ws",
            ]
        if "seg" in self._fields:
            cols.append("seg")  # per-posting source segment (tombmask)
        tbl = self._ds.to_table(columns=cols, filter=filt)
        return tbl.to_pandas()

    def search(self, queries: list[str] | str, k: int = 10) -> list:
        """Top-k per query → ``[[{"doc_id", "score", "rank"}, ...], ...]``
        (a single string returns the inner list directly).

        One pyarrow read covers the batch's term union; scoring runs
        the cluster scorer per (query, subgroup) in-process."""
        from neural_cherche_spark.query.bmw import (
            _bmw_group_fn,
            serving_match_rows,
        )

        single = isinstance(queries, str)
        qlist = [queries] if single else list(queries)
        rows = serving_match_rows(self, qlist)
        out: list[list[dict]] = [[] for _ in qlist]
        if rows:
            pdf = self._read_postings(rows)
            score_group = _bmw_group_fn(
                k, self._raw_cfg, tomb_src=self._tomb_src
            )
            # per-query term info: (qtf, n_salts, s_t) keyed by term_id
            per_q: list[dict[int, tuple[float, int, float]]] = [
                {} for _ in qlist
            ]
            for r in rows:
                # query-time per-term scale, raw storage only (weights
                # bake idf·term_norm into the stored w at build time)
                s_t = (
                    float(r["idf"]) / float(r["term_norm"])
                    if self.storage == "raw"
                    else 0.0
                )
                for q in r["qs"]:
                    per_q[int(q["query_id"])][int(r["term_id"])] = (
                        float(q["qtf"]),
                        int(r["n_salts"]),
                        s_t,
                    )
            for qid, terms in enumerate(per_q):
                if not terms:
                    continue
                res = self._score_one(pdf, terms, k, score_group)
                out[qid] = res
        return out[0] if single else out

    # ------------------------------------------------------------------
    def _score_one(
        self,
        pdf: pd.DataFrame,
        terms: dict[int, tuple[float, int, float]],
        k: int,
        score_group,
    ) -> list:
        sub = pdf[pdf["term_id"].isin(list(terms))]
        if len(sub) == 0:
            return []
        tid = sub["term_id"].to_numpy(dtype=np.int64)
        tmap_q = {t: v[0] for t, v in terms.items()}
        qtf = np.array([tmap_q[t] for t in tid], dtype=np.float64)
        n_groups = min(
            max(int(v[1]) for v in terms.values()), self.subgroup_cap
        )
        raw = self.storage == "raw"
        if raw:
            # raw blocks: the salt layout of a delta-grown index can
            # differ per segment — n_salts comes from the postings ROW
            # (same rule as search_bmw's raw branch)
            n_salts = sub["n_salts"].to_numpy(dtype=np.int64)
        else:
            tmap_s = {t: v[1] for t, v in terms.items()}
            n_salts = np.array([tmap_s[t] for t in tid], dtype=np.int64)
        # grp expansion — the local twin of search_bmw's CASE expr:
        # low-salt blocks replicate across their residue class, finer-
        # salted blocks map to exactly one subgroup
        salt = sub["salt"].to_numpy(dtype=np.int64)
        reps = np.where(n_salts <= n_groups, n_groups // n_salts, 1)
        idx = np.repeat(np.arange(len(sub)), reps)
        m = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.empty(0, dtype=np.int64)
        grp = np.where(
            n_salts[idx] <= n_groups,
            salt[idx] + m * n_salts[idx],
            salt[idx] % n_groups,
        )
        base = sub.iloc[idx].reset_index(drop=True).copy()
        base["qtf"] = qtf[idx]
        base["grp"] = grp
        base["n_groups"] = n_groups
        base["query_id"] = 0
        if raw:
            # block score bounds from tf/dl extrema — the numpy twin of
            # search_bmw's w1_hi/w1_lo columns, same f64 margins
            from neural_cherche_spark.index.codec import bm25_w1

            k1, b, eps, avgdl = self._raw_cfg[:4]
            tmap_st = {t: v[2] for t, v in terms.items()}
            s_t = np.array([tmap_st[t] for t in tid], dtype=np.float64)[idx]
            w1_hi = (
                bm25_w1(
                    sub["max_tf"].to_numpy(dtype=np.float64)[idx],
                    sub["min_dl"].to_numpy(dtype=np.float64)[idx],
                    k1, b, avgdl, eps,
                )
                * (1.0 + 1e-9) + 1e-12
            )
            w1_lo = np.maximum(
                0.0,
                bm25_w1(
                    sub["min_tf"].to_numpy(dtype=np.float64)[idx],
                    sub["max_dl"].to_numpy(dtype=np.float64)[idx],
                    k1, b, avgdl, eps,
                )
                * (1.0 - 1e-9) - 1e-12,
            )
            pos = s_t >= 0
            base["s_t"] = s_t
            base["max_w"] = np.where(pos, s_t * w1_hi, s_t * w1_lo)
            base["min_w"] = np.where(pos, s_t * w1_lo, s_t * w1_hi)
        parts = []
        for _, g in base.groupby("grp", sort=False):
            r = score_group(g.reset_index(drop=True))
            if len(r):
                parts.append(r)
        if not parts:
            return []
        allr = pd.concat(parts, ignore_index=True)
        # final rank: same tie-break as the cluster window
        order = np.lexsort(
            (allr["doc_id"].to_numpy(), -allr["score"].to_numpy())
        )[:k]
        return [
            {
                "doc_id": int(allr["doc_id"].iloc[i]),
                "score": float(allr["score"].iloc[i]),
                "rank": rank + 1,
            }
            for rank, i in enumerate(order)
        ]
