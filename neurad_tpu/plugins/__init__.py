"""Plugin discovery: external method/dataparser registration."""

from neurad_tpu.plugins.registry import discover_methods, discover_dataparsers  # noqa: F401
