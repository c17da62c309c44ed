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
        subgroup_cap: int = 1,
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
        # needs n_groups | n_salts whenever n_salts > n_groups).
        # DEFAULT 1 here (not the cluster's 32): subgroups exist to
        # parallelize one query across executors, but this tier scores
        # groups SEQUENTIALLY in-process — a split >1 only buys
        # replicated decode of every low-salt term plus a doc_salt
        # ownership mask over every posting (profiled at ~2x the
        # single-group score cost). Results are identical either way
        # (each subgroup is exact over a disjoint doc shard).
        self.subgroup_cap = 1 << (max(1, subgroup_cap).bit_length() - 1)
        # dataset handle opened once: file listing + partition
        # discovery are per-searcher, not per-query
        self._ds = ds.dataset(postings_dir, format="parquet", partitioning="hive")
        self._fields = set(self._ds.schema.names)
        # per-searcher parquet row-group index (built lazily on first
        # miss): footer metadata parsing was ~2/3 of every cache-miss
        # scan wall — with it cached, a query reads ONLY the row groups
        # whose term_id min/max overlap its terms (the builder writes
        # term-sorted ~4 MB row groups for exactly this)
        self._rgmap = None

    # ------------------------------------------------------------------
    @classmethod
    def from_index(
        cls,
        index,
        queries: list[str] | None = None,
        subgroup_cap: int = 1,
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
                hits.append(self._decoded(t))
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
                    # hit counter 0: decoded arrays attach on the
                    # third access (see _decoded)
                    self._cache[int(t)] = (sub, nb, 0)
                    self._cache_bytes += nb
                while self._cache_bytes > self._cache_cap and self._cache:
                    _, (_, nb, _) = self._cache.popitem(last=False)
                    self._cache_bytes -= nb
        if not parts:
            return pd.DataFrame()
        return (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
        )

    def _decoded(self, t: int) -> pd.DataFrame:
        """Cached rows of term ``t``, with pre-decoded posting arrays
        attached on the THIRD access (two repeat hits mark the term
        hot; decoding lazily keeps cold and lukewarm accesses exactly
        as cheap as before — a benchmark whose terms repeat only once
        pays nothing — and never pre-decodes blocks a rarely-seen
        term's queries may skip).

        The decoded payload rides the cached frame as object columns
        (``__dd`` + ``__dw`` | ``__dtf``/``__ddl``) — one numpy array
        per block row; the group scorer's decode_chunk concatenates
        them instead of re-running the varint decode (profiled at ~18%
        of serving wall on repeat-heavy workloads). LRU accounting
        includes the decoded bytes."""
        import numpy as np

        from neural_cherche_spark.index.codec import (
            decode_blocks_batched,
            decode_blocks_raw_batched,
        )

        sub, nb, hits = self._cache[t]
        if hits >= 2 and "__dd" not in sub.columns:
            ns = sub["n"].to_numpy(dtype=np.int64)
            splits = np.cumsum(ns)[:-1]
            if self.storage == "raw":
                d, tf, dl = decode_blocks_raw_batched(
                    list(sub["docs"]), list(sub["tfs"]),
                    list(sub["dls"]), ns,
                )
                sub = sub.copy()
                sub["__dd"] = np.split(d, splits)
                sub["__dtf"] = np.split(tf, splits)
                sub["__ddl"] = np.split(dl, splits)
                extra = d.nbytes + tf.nbytes + dl.nbytes
            else:
                d, w = decode_blocks_batched(list(sub["docs"]), list(sub["ws"]), ns)
                sub = sub.copy()
                sub["__dd"] = np.split(d, splits)
                sub["__dw"] = np.split(w, splits)
                extra = d.nbytes + w.nbytes
            self._cache[t] = (sub, nb + extra, hits + 1)
            self._cache_bytes += extra
            while self._cache_bytes > self._cache_cap and self._cache:
                _, (_, nbe, _) = self._cache.popitem(last=False)
                self._cache_bytes -= nbe
        else:
            self._cache[t] = (sub, nb, hits + 1)
        return sub

    def _rg_index(self):
        """(fragments, seg-per-fragment, per-row-group term_id min/max
        arrays) — parquet footers parsed ONCE per searcher. Segment
        filtering happens here at the fragment level: only segments
        committed by THIS manifest are indexed (an orphan seg dir from
        a crashed refresh stays invisible — same rule as
        BM25Index.postings)."""
        if self._rgmap is None:
            import pyarrow.dataset as ds

            segs = (
                {int(s["seg"]) for s in self.manifest.segments}
                if "seg" in self._fields
                else None
            )
            frags: list = []
            fsegs: list = []
            tmins: list = []
            tmaxs: list = []
            fidx: list = []
            rgids: list = []
            for frag in self._ds.get_fragments():
                keys = ds.get_partition_keys(frag.partition_expression)
                seg_val = keys.get("seg")
                if segs is not None and int(seg_val) not in segs:
                    continue
                frag.ensure_complete_metadata()
                fi = len(frags)
                frags.append(frag)
                fsegs.append(seg_val)
                for rg in frag.row_groups:
                    st = (rg.statistics or {}).get("term_id") or {}
                    # missing stats → unbounded range (never pruned)
                    tmins.append(int(st.get("min", -(1 << 62))))
                    tmaxs.append(int(st.get("max", 1 << 62)))
                    fidx.append(fi)
                    rgids.append(rg.id)
            self._rgmap = (
                frags,
                fsegs,
                np.asarray(tmins, dtype=np.int64),
                np.asarray(tmaxs, dtype=np.int64),
                np.asarray(fidx, dtype=np.int64),
                np.asarray(rgids, dtype=np.int64),
            )
        return self._rgmap

    def _scan_postings(self, rows: list) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.dataset as ds

        self.cache_misses += 1
        frags, fsegs, tmins, tmaxs, fidx, rgids = self._rg_index()
        tids = np.asarray(
            sorted(int(r["term_id"]) for r in rows), dtype=np.int64
        )
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
        # row groups whose [min, max] term range contains a queried
        # term — smallest queried tid ≥ min must be ≤ max
        pos = np.searchsorted(tids, tmins)
        hit = pos < tids.size
        hit[hit] = tids[pos[hit]] <= tmaxs[hit]
        filt = ds.field("term_id").isin(pa.array(tids))
        # ONE batched scan over the selected row groups: subset
        # fragments re-wrapped as a dataset so pyarrow runs a single
        # multithreaded scanner (a per-fragment to_table loop costs
        # ~2 ms scanner setup × O(100) fragments per query)
        sel_frags = []
        for fi in np.unique(fidx[hit]):
            sel = rgids[hit & (fidx == fi)]
            sel_frags.append(
                frags[int(fi)].subset(row_group_ids=[int(i) for i in sel])
            )
        out_cols = cols + (["seg"] if "seg" in self._fields else [])
        if not sel_frags:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        sub_ds = ds.FileSystemDataset(
            sel_frags,
            schema=self._ds.schema,
            format=self._ds.format,
            filesystem=self._ds.filesystem,
        )
        return sub_ds.to_table(columns=out_cols, filter=filt).to_pandas()

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
        if int(reps.max(initial=1)) == 1:
            # no block replication (always the case at subgroup_cap=1):
            # skip the expansion copy entirely
            idx = np.arange(len(sub))
            base = sub.reset_index(drop=True).copy()
            base["qtf"] = qtf
            grp = np.where(n_salts <= n_groups, salt, salt % n_groups)
        else:
            # vectorized within-rep counter (the per-row np.arange list
            # comprehension here was ~0.5 s over a 48-query profile)
            cum = np.cumsum(reps)
            idx = np.repeat(np.arange(len(sub)), reps)
            m = np.arange(int(cum[-1])) - np.repeat(cum - reps, reps)
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
