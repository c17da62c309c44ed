from neural_cherche_spark.text.decorate import decorate  # noqa: F401
from neural_cherche_spark.text.ngrams import (  # noqa: F401
    char_wb_ngrams,
    ngram_terms_column,
    tokenize_terms,
    word_tokens_column,
)
