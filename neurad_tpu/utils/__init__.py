"""Utilities: logging/writer, profiler, colormaps."""
