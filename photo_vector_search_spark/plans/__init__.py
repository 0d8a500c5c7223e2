"""Declared query plans: each module exposes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL twin). ``__spark_entry__`` aggregates
them into the driver contract."""
