"""Operator library. Each module exposes pure functions
(spark, sf_dir) → DataFrame or (DataFrame, ...) → DataFrame, all
declarative plans (no collect, no driver loops)."""
