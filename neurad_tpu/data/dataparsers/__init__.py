"""Dataparsers: synthetic (testing), PandaSet, nuScenes, Argoverse2, ZOD, KITTI, Waymo."""
