"""General data-processing operators over parquet tables — the SQL-checkable
face of the engine (driver correctness gate) plus the large-scale
training-data-pipeline operators (dedup family, similarity search, text
analysis, multimodal stubs)."""
