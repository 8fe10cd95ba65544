"""Sources & sinks: transcript tables, parquet/Iceberg IO, checkpointing."""
