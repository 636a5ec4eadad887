from stark_spark.raster.tiles import (TILE_COLS, rasterize, tile_bbox_cols,
                                      with_sma, r_min, r_max, r_median,
                                      count_value, has_value, tile_histogram,
                                      raster_histogram, save_tiles, load_tiles,
                                      tiles_from_csv, save_tiles_csv)
from stark_spark.raster.join import raster_filter_vector, raster_join_vector, \
    raster_join_raster

__all__ = ["TILE_COLS", "rasterize", "tile_bbox_cols", "with_sma",
           "r_min", "r_max", "r_median", "count_value", "has_value",
           "tile_histogram", "raster_histogram", "save_tiles", "load_tiles",
           "tiles_from_csv", "save_tiles_csv",
           "raster_filter_vector", "raster_join_vector", "raster_join_raster"]
