"""search_engine_spark — a from-scratch PySpark-native full-text indexing and
BM25 retrieval engine.

Semantics derive from the reference engine (FinesserULTRA/Search-Engine, at
/root/reference — see SURVEY.md); the architecture is idiomatic Spark:
DataFrame/SQL plans, Arrow-vectorized pandas UDFs, partition-parallel
map -> repartition-by-term shuffle -> sortWithinPartitions merge index build,
docID-delta+varint compressed barrel posting lists with block-max metadata,
and distributed top-k (TakeOrderedAndProject) query execution.
"""

__version__ = "0.1.0"
