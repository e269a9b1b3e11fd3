"""Device (JAX/XLA/Pallas) compute path."""
