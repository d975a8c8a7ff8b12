"""End-to-end Ray Data pipelines: validation runs, stats, dedup, search."""
