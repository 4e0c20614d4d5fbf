"""Multi-chip sharding: view-parallel and Z-block (halo) deconvolution."""
