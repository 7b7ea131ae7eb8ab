"""Spark operators: index build, posting codec, query scorers, dedup, ANN."""
