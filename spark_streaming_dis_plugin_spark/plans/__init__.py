"""Query registry backing __spark_entry__.py."""
