from polardbx_tools_spark.operators import dedup, masking, similarity, text

__all__ = ["dedup", "masking", "similarity", "text"]
