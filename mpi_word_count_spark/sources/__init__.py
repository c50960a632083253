"""Custom source connectors (Spark 4 Python Data Source API)."""
