"""Source/sink connectors beyond the fixture parquet (SURVEY.md §2B)."""
