from stark_spark.partitioner.grid import GridSpec
from stark_spark.partitioner.bsp import bsp_partitions, assign_bsp_cells
from stark_spark.partitioner.temporal import temporal_range_partition

__all__ = ["GridSpec", "bsp_partitions", "assign_bsp_cells",
           "temporal_range_partition"]
