"""Sensor models: cameras (pinhole/fisheye/equirect, rolling shutter) and lidars."""

from neurad_tpu.cameras.cameras import CameraType, Cameras  # noqa: F401
from neurad_tpu.cameras.lidars import LidarType, Lidars  # noqa: F401
