from neural_cherche_spark.index.build import (  # noqa: F401
    BM25Config,
    bm25_weights,
    collection_stats,
    doc_lengths,
    term_frequencies,
    term_stats,
    tfidf_weights,
)
