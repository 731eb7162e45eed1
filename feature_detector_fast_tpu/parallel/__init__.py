"""Multi-device parallelism: meshes, shardings, collective layers."""
