"""Reusable column-expression libraries (no UDFs in the hot path)."""
