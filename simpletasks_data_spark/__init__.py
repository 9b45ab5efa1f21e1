"""simpletasks-data-spark: a PySpark-native declarative import/merge engine.

Re-expresses the capability surface of upOwa/simpletasks-data (reference at
/root/reference) on Spark DataFrames: declarative column mappings compiled
to Catalyst expressions, a full-outer-join merge planner with per-column
policies, CDC history, counter metrics — plus large-scale extensions
(dedup, similarity search, text analysis) for training-data pipelines.
"""

__version__ = "0.1.0"
