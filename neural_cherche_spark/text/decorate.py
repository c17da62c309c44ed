"""Model-input text decoration (SURVEY §2.2 P5).

The reference's neural encoders prepend a role marker to every text
and, for Splade-family models, append a run of MASK tokens that the
encoder may fill with expansion terms:

* ``models/base.py:29-34`` — ``query_prefix="[Q] "``,
  ``document_prefix="[D] "`` constructor defaults shared by every
  model;
* ``models/splade.py:205-207`` —
  ``prefix + text + " " + " ".join([mask_token] * n_mask_tokens)``;
* ``models/colbert.py:208-209`` — ``prefix + text`` (no suffix).

The decoration itself is pure string concatenation, so it stays a
Catalyst expression (whole-stage codegen, no Python) — the one
per-row op a 10^12-doc encode pipeline runs before the heavy UDF is
exactly the one that must NOT be a UDF. The neural encode behind it
is out of scope offline (torch absent); the decorated column is the
real, tested input contract for it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUERY_PREFIX = "[Q] "
DOCUMENT_PREFIX = "[D] "
# reference models/base.py:35 default count; the literal token string
# is tokenizer-specific — "[MASK]" is the BERT-family default the
# reference models ship with
MASK_TOKEN = "[MASK]"
N_MASK_TOKENS = 5


def decorate(
    col: Column | str,
    query_mode: bool = False,
    query_prefix: str = QUERY_PREFIX,
    document_prefix: str = DOCUMENT_PREFIX,
    n_mask_tokens: int = 0,
    mask_token: str = MASK_TOKEN,
) -> Column:
    """Reference-exact decorated text column.

    ``n_mask_tokens=0`` is the ColBERT shape (prefix only,
    colbert.py:208-209); ``n_mask_tokens>0`` the Splade shape
    (prefix + text + " " + masks, splade.py:205-207). NULL text
    passes through as NULL (the encode batcher drops it), mirroring
    the reference's list-comprehension which never sees missing
    entries."""
    c = F.col(col) if isinstance(col, str) else col
    prefix = query_prefix if query_mode else document_prefix
    out = F.concat(F.lit(prefix), c)
    if n_mask_tokens > 0:
        suffix = " " + " ".join([mask_token] * n_mask_tokens)
        out = F.concat(out, F.lit(suffix))
    return out
