"""Models: NeuRAD (neural feature field), nerfacto-family, SplatAD (gaussians)."""
