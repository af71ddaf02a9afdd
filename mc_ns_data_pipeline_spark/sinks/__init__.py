"""Sinks: partitioned files, upsert/replace warehouse writes, audit."""
