"""Fields and field components (encodings, MLPs, distortions, NeuRAD fields)."""
