"""Sources & sinks (SURVEY.md §2.1): schema-checked readers for parquet/
CSV/JSON, and scale-aware writers (partitioned, sorted-on-write "index"
analog, bucketed tables)."""
