"""Export utilities: TSDF fusion, mesh extraction, PLY writing."""
