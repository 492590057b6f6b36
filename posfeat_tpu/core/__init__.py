"""Core runtime: config system, checkpoints, mesh/sharding helpers."""
