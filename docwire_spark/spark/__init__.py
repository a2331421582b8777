"""Distributed shell: sharding, salting, extraction job, lineage,
synthetic corpus generation."""
