"""Deterministic corpus sampling (pipeline surface beyond the
reference; SURVEY §2 LLM-ops family).

A 100 TB pipeline samples with a pure hash-threshold FILTER, never an
RNG: the decision for a row depends only on (salt, key), so re-runs,
retried tasks, and different engines agree row-for-row; no shuffle, no
sampling state, and the filter composes with partition pruning.  This
is the standard reproducible-subset idiom (mod-hash bucketing as in
Common Crawl / CCNet processing pipelines — public practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame,
    rate_num: int = 51,
    rate_den: int = 256,
    key_cols: tuple[str, ...] = ("doc_id",),
    salt: str = "sample",
) -> DataFrame:
    """Keep rows whose md5(salt|key...) leading byte < rate_num/rate_den.

    ``rate_den`` must be 256 (one hex byte of selectivity — coarse by
    design: the point is engine-portable determinism, and a lexicographic
    compare on two lowercase hex chars is identical in every engine that
    has md5).  Returns the input rows unchanged, filtered.
    """
    if rate_den != 256:
        raise ValueError("hash_sample: rate_den must be 256 (one md5 byte)")
    if not 0 <= rate_num <= 256:
        raise ValueError("hash_sample: rate_num out of [0, 256]")
    if rate_num == 256:  # '100' would break the 2-hex-char compare
        return df
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.substring(F.md5(key), 1, 2) < F.lit(format(rate_num, "02x")))
