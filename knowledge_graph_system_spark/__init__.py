"""kg-spark: a PySpark-native knowledge-graph analytics engine.

From-scratch engine with the query/data-processing capabilities of
aaronsb/knowledge-graph-system (see SURVEY.md), built Spark-first:
DataFrame/SQL plans optimized by Catalyst, iterative-join traversal
over cached columnar edges, and Structured Streaming for event feeds.
"""

__version__ = "0.1.0"
