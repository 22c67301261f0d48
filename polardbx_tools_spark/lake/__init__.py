from polardbx_tools_spark.lake.table import LakeTable, Snapshot
from polardbx_tools_spark.lake.merge import merge_into, MergeStats

__all__ = ["LakeTable", "Snapshot", "merge_into", "MergeStats"]
