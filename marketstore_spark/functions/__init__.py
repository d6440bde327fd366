"""Column-level helpers — all JVM-side expressions (no Python UDFs in
any hot path; SURVEY §6)."""

from marketstore_spark.functions.finance import log_returns, simple_returns, twap, vwap
from marketstore_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = [
    "vwap",
    "twap",
    "simple_returns",
    "log_returns",
    "dot",
    "l2_norm",
    "cosine_sim",
]
