from neural_cherche_spark.query.exact import (  # noqa: F401
    query_term_counts,
    retrieve_exact,
    top_k,
)
