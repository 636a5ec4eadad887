"""stark_spark — a PySpark-native spatio-temporal analytics engine.

A from-scratch re-expression of the capabilities of dbis-ilm/stark
(spatio-temporal filters, joins, kNN, skyline, DBSCAN, raster tiles,
spatial partitioning + pruning, SQL `st_*` surface) on idiomatic
PySpark DataFrames, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design (SURVEY.md §7): geometry = WKB BinaryType column + native bbox
columns (`xmin,ymin,xmax,ymax`) + nullable epoch-long `t_start,t_end`.
Cheap phases (bbox prefilter, cell assignment, distance on points) are
native Catalyst expressions inside whole-stage codegen; exact geometry
refinement is Arrow-vectorized pandas UDFs over the pure-numpy kernel
in `stark_spark.core.geometry` (no Shapely in this environment).
"""

from stark_spark.session import get_session, configure
from stark_spark.api import STFrame

__all__ = ["get_session", "configure", "STFrame"]

__version__ = "0.1.0"
