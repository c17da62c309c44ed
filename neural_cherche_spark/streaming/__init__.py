from neural_cherche_spark.streaming.incremental import (  # noqa: F401
    IncrementalBM25Builder,
    stream_build,
)
from neural_cherche_spark.streaming.compressed import (  # noqa: F401
    CompressedIndexStream,
    stream_build_compressed,
)
from neural_cherche_spark.streaming.stateful import (  # noqa: F401
    streaming_exact_dedup,
    streaming_windowed_term_counts,
)
