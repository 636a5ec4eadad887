from stark_spark.partitioner.grid import GridSpec
from stark_spark.partitioner.bsp import bsp_partitions, assign_bsp_cells
from stark_spark.partitioner.temporal import temporal_range_partition
from stark_spark.partitioner.rtree import (StrSpec, str_partitioner,
                                           str_repartition)
from stark_spark.partitioner.config import partition_hint

__all__ = ["GridSpec", "bsp_partitions", "assign_bsp_cells",
           "temporal_range_partition", "StrSpec", "str_partitioner",
           "str_repartition", "partition_hint"]
