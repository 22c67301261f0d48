from polardbx_tools_spark.operators import (
    bpe, dedup, lm, masking, similarity, text,
)

__all__ = ["bpe", "dedup", "lm", "masking", "similarity", "text"]
