"""Model components: samplers, renderers, losses, dynamic actors, colliders, CNNs."""
