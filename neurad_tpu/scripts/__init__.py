"""CLI entry points: nt-train, nt-eval, nt-render, nt-export, nt-viewer."""
