"""Shared experiment-runner machinery for the CNN-family sweeps."""
