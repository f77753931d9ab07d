"""Spark plan assembly (the relational shell Catalyst optimizes)."""
