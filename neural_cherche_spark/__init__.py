"""neural_cherche_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the sparse-retrieval semantics of
raphaelsty/neural-cherche (reference: /root/reference, v1.4.3) as an
idiomatic Spark engine:

* tokenization as JVM-side Catalyst expressions (lowercase + in-word
  char 3-5-grams, reference ``retrieve/bm25.py:131-137`` semantics),
* distributed term statistics and BM25/TF-IDF weighting as DataFrame
  aggregations (reference ``retrieve/bm25.py:146-197``),
* doc-partitioned posting-list construction with delta-gap + varint
  compression and per-block max-score, term-partitioned shuffle-merge,
* block-max top-k BM25 query answering, rank-identical to the
  reference retriever (``retrieve/bm25.py:38-108`` doctest goldens).

Nothing in this package is a port: the reference is an in-memory
scipy-CSR library; this is a distributed DataFrame/SQL engine.
"""

__version__ = "0.1.0"

from neural_cherche_spark.session import get_spark  # noqa: F401
