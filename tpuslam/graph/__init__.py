"""Pose graph: storage, residual model, LM + PCG optimizer."""
