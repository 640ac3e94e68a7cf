"""mimir_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TauferLab/Mimir (MPI MapReduce), plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing), designed for 100 TB scale.

Reference parity is with the public Mimir API surface (map / combiner /
aggregate / convert / reduce / scan / output) and its benchmark
workloads (WordCount, BFS, Octree clustering) — re-expressed as
declarative Spark DataFrame plans, not a translation of the MPI engine.
"""

from mimir_spark.session import get_spark, stop_spark
from mimir_spark.api import MimirPipeline

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "MimirPipeline", "__version__"]
