from neural_cherche_spark.streaming.incremental import (  # noqa: F401
    IncrementalBM25Builder,
    stream_build,
)
