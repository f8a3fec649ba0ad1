"""Declared operators (SURVEY.md §2). Each module self-registers into
vectordb_agentic_rag_spark.registry via the @query decorator."""
