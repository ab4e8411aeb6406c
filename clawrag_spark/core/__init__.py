"""Pure-Python per-document core, shared by Spark UDFs and the oracle."""
