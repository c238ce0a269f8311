"""Spark DataFrame layer: extraction operators, node-table queries,
dedup/similarity/text-analysis ops, and pipeline plumbing."""
