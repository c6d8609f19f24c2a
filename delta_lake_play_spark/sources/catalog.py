"""Parquet source catalog over the driver's synthetic tables.

The reference reads one Delta table from a directory
(``spark_project.py:25-27``); here the source layer is a thin catalog
over the TPC-H-ish parquet tables plus ``events`` / ``documents`` /
``embeddings`` (see TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and vectorized scans for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins, even at
# 100 TB fact scale (they grow sub-linearly or are fixed-cardinality).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for SQL-form queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
