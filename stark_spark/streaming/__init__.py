from stark_spark.streaming.stream import (read_event_stream, st_stream_filter,
                                          windowed_cell_counts,
                                          windowed_stats, session_stats,
                                          stateful_cell_extremes,
                                          geofence_counts,
                                          stream_dedup,
                                          stream_sessionize,
                                          st_stream_stream_join)

__all__ = ["read_event_stream", "st_stream_filter", "windowed_cell_counts",
           "windowed_stats", "session_stats", "stateful_cell_extremes",
           "geofence_counts", "stream_dedup", "stream_sessionize",
           "st_stream_stream_join"]
