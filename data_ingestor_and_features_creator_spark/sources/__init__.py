"""Source connectors (SURVEY.md §2.1): every reader the engine
supports, with one non-negotiable rule — **schemas are always declared,
never inferred** in production paths. Inference costs a full scan at
100 TB and can silently widen types between runs; a declared StructType
makes the scan a straight columnar decode and keeps column pruning /
predicate pushdown working against a stable schema.
"""

from .readers import (binary_dir, csv_with_schema, events_stream,
                      json_string_column, parquet_table)

__all__ = ["parquet_table", "csv_with_schema", "json_string_column",
           "binary_dir", "events_stream"]
