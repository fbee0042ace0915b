"""Algorithm kernels: interpolation, raycasting, grid updates, features."""
