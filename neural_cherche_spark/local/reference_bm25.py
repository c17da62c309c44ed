"""In-memory numpy re-implementation of the reference BM25 semantics.

This is NOT part of the Spark engine — it is the *oracle* used by the
test suite to assert rank-identity of the distributed pipelines on
arbitrary corpora, mirroring the semantics of
``neural_cherche.retrieve.BM25`` (reference retrieve/bm25.py:118-197,
retrieve/tfidf.py:100-144,163-217) including:

* fit-once vocabulary (tfidf.py:114-117) — query terms unseen at fit
  time are dropped, exactly like ``transform`` on a frozen vectorizer;
* float32 index arithmetic (bm25.py:151-153,163-171,185-190);
* collection term frequency = total occurrences, not doc-frequency
  (bm25.py:155-157);
* per-batch avgdl (bm25.py:161), globally accumulated tf (155-157);
* per-term L2 normalization applied over the FULL accumulated matrix
  after append — the semantics encoded by the shipped two-batch
  doctest goldens (bm25.py:98-108; SURVEY.md §2.8 [EMPIRICAL]);
* positive-score filter + top-k (tfidf.py:163-174,210-217).

Dense numpy is fine: the oracle only ever runs on test fixtures.
"""

from __future__ import annotations

import numpy as np

from neural_cherche_spark.text.ngrams import char_wb_ngrams


class ReferenceBM25:
    """Oracle BM25 with reference semantics (see module docstring)."""

    def __init__(
        self,
        k1: float = 1.5,
        b: float = 0.75,
        epsilon: float = 0.0,
        n_min: int = 3,
        n_max: int = 5,
    ) -> None:
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.n_min, self.n_max = n_min, n_max
        self.vocab: dict[str, int] = {}
        self.fitted = False
        self.doc_keys: list = []
        self.tf_total: np.ndarray | None = None  # (V,) accumulated
        # matrix rows = terms, cols = docs (the reference stores V×docs)
        self.matrix: np.ndarray | None = None  # float32, L2-normalized rows

    # -- tokenize + count ------------------------------------------------
    def _counts(self, texts: list[str], fit: bool) -> np.ndarray:
        """(n_texts, V) float32 raw n-gram counts; fits vocab once."""
        toks = [char_wb_ngrams(t, self.n_min, self.n_max) for t in texts]
        if fit and not self.fitted:
            for ts in toks:
                for t in ts:
                    if t not in self.vocab:
                        self.vocab[t] = len(self.vocab)
            self.fitted = True
        V = len(self.vocab)
        out = np.zeros((len(texts), V), dtype=np.float32)
        for i, ts in enumerate(toks):
            for t in ts:
                j = self.vocab.get(t)
                if j is not None:
                    out[i, j] += 1.0
        return out

    # -- index build (reference add(), bm25.py:146-197) -------------------
    def add(self, keys: list, texts: list[str]) -> "ReferenceBM25":
        counts = self._counts(texts, fit=True)  # (B, V) float32
        V = len(self.vocab)
        if self.tf_total is None:
            self.tf_total = np.zeros(V, dtype=np.float32)
        elif self.tf_total.shape[0] < V:
            self.tf_total = np.pad(self.tf_total, (0, V - self.tf_total.shape[0]))
        self.tf_total += counts.sum(axis=0)

        dl = counts.sum(axis=1)  # (B,) doc length
        avgdl = dl.mean()  # per-batch, bm25.py:161
        reg = self.k1 * (1.0 - self.b + self.b * dl / avgdl)  # (B,)
        nz = counts > 0
        w1 = np.where(
            nz, counts * (self.k1 + 1.0) / (counts + reg[:, None]) + self.epsilon, 0.0
        ).astype(np.float32)

        self.doc_keys.extend(keys)
        n_docs = len(self.doc_keys)  # includes this batch, bm25.py:180-190
        idf = np.log(
            (n_docs - self.tf_total + 0.5) / (self.tf_total + 0.5) + 1.0
        ).astype(np.float32)
        w2 = (w1 * idf[None, :]).T  # (V, B)

        if self.matrix is None:
            full = w2
        else:
            old = self.matrix
            if old.shape[0] < V:
                old = np.pad(old, ((0, V - old.shape[0]), (0, 0)))
            full = np.hstack([old, w2])
        # per-term L2 over the FULL accumulated matrix (golden semantics)
        norms = np.sqrt((full.astype(np.float32) ** 2).sum(axis=1))
        norms[norms == 0] = 1.0
        self.matrix = (full / norms[:, None].astype(np.float32)).astype(np.float32)
        return self

    # -- query (tfidf.py:176-219) -----------------------------------------
    def __call__(self, queries: list[str], k: int | None = None) -> list[list[dict]]:
        q = self._counts(queries, fit=False)  # frozen vocab
        scores = q @ self.matrix  # (Q, n_docs) float32
        k = k or len(self.doc_keys)
        out = []
        for row in scores:
            order = np.argsort(-row, kind="stable")[:k]
            out.append(
                [
                    {"key": self.doc_keys[j], "similarity": float(row[j])}
                    for j in order
                    if row[j] > 0
                ]
            )
        return out
