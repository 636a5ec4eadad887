from stark_spark.functions.constructors import (
    st_point, st_geomfromwkt, st_wkt, with_bbox, with_time, st_frame,
)
from stark_spark.functions.predicates import (
    st_predicate, bbox_intersects, bbox_filter, st_relate_pair,
)
from stark_spark.functions.distance import st_distance_to, st_distance_xy
from stark_spark.functions.register import register_sql_functions

__all__ = [
    "st_point", "st_geomfromwkt", "st_wkt", "with_bbox", "with_time",
    "st_frame", "st_predicate", "bbox_intersects", "bbox_filter",
    "st_relate_pair", "st_distance_to", "st_distance_xy",
    "register_sql_functions",
]
