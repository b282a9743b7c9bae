"""Method configuration registry and CLI plumbing."""
