"""Pipelines: glue between datamanagers, models, and the trainer."""
