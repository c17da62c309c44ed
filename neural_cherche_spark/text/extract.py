"""HTML → text extraction (Arrow-vectorized pandas UDF).

Per BASELINE.json:input_hint the engine ingests ``html:binary`` and
must produce byte-identical extracted text per url. The synthetic
corpus (data/synth.py) wraps text in a fixed deterministic envelope;
this UDF inverts it with vectorized pandas string ops (no per-row
Python loop). A real-world extractor (trafilatura/bs4 class) would
slot in behind the same signature; those libs are not in this
container, so anything beyond the deterministic envelope raises
NotImplementedError (clearly-marked stub, Spark plumbing real).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_PREFIX = "<html><body><p>"
_SUFFIX = "</p></body></html>"


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Decode + strip the deterministic envelope, vectorized."""
    s = html.str.decode("utf-8")
    out = s.str.slice(len(_PREFIX), -len(_SUFFIX))
    # envelope mismatch → fail loudly (stub boundary, not silent garbage)
    bad = s.notna() & ~(s.str.startswith(_PREFIX) & s.str.endswith(_SUFFIX))
    if bool(bad.any()):
        raise NotImplementedError(
            "non-synthetic HTML: plug a real extractor (trafilatura/bs4) "
            "behind extract_text(); not available in this container"
        )
    return out
