"""Data layer: dataparsers, datasets, samplers, datamanagers."""
