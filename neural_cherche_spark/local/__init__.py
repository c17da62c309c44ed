from neural_cherche_spark.local.reference_bm25 import ReferenceBM25  # noqa: F401
