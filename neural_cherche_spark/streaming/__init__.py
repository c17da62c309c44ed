from neural_cherche_spark.streaming.incremental import (  # noqa: F401
    IncrementalBM25Builder,
    stream_build,
)
from neural_cherche_spark.streaming.compressed import (  # noqa: F401
    CompressedIndexStream,
    stream_build_compressed,
)
from neural_cherche_spark.streaming.stateful import (  # noqa: F401
    lsh_band_key_exprs,
    lsh_band_keys_column,
    streaming_exact_dedup,
    streaming_lsh_candidates,
    streaming_windowed_term_counts,
)
