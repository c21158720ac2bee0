"""Column-level helper functions shared across operators."""

from calp_cva_tracking_pipeline_spark.functions.numeric import (
    money_avg,
    money_sum,
    product_sum,
    round6,
)
from calp_cva_tracking_pipeline_spark.functions.text import (
    canonicalize_name,
    keyword_flag,
    regex_quote,
    token_count,
    tokens,
)
from calp_cva_tracking_pipeline_spark.functions.hashing import (
    stable_hash64,
    word_hashes,
)

__all__ = [
    "money_sum",
    "money_avg",
    "product_sum",
    "round6",
    "canonicalize_name",
    "keyword_flag",
    "regex_quote",
    "token_count",
    "tokens",
    "stable_hash64",
    "word_hashes",
]
