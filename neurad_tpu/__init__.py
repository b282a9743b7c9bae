"""neurad_tpu: a TPU-native (JAX/XLA/Pallas) neural rendering framework for autonomous driving.

Re-implements, from scratch and TPU-first, the capabilities of georghess/neurad-studio
(NeuRAD, CVPR 2024; SplatAD, CVPR 2025): multi-camera + lidar neural rendering of driving
sequences with dynamic actors. See SURVEY.md at the repo root for the structural map of the
reference this framework mirrors feature-for-feature.
"""

__version__ = "0.1.0"
