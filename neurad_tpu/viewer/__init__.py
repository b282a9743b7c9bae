"""Interactive browser viewer (self-contained HTTP, no viser dependency)."""

from neurad_tpu.viewer.server import ViewerServer  # noqa: F401
