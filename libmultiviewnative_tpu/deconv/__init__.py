"""Multi-view Richardson-Lucy deconvolution drivers."""
