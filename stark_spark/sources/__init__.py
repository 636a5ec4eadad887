from stark_spark.sources.partitioned import (load_manifest, load_partitioned,
                                             read_pruned, save_partitioned,
                                             knn_pruned, join_pruned,
                                             save_bucketed, zip_join_bucketed)

__all__ = ["save_partitioned", "load_partitioned", "load_manifest",
           "read_pruned", "knn_pruned", "join_pruned",
           "save_bucketed", "zip_join_bucketed"]
