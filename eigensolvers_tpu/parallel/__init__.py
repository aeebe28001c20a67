"""Mesh-sharded execution: device meshes, sharded vector backend."""
