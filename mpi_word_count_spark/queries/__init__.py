"""Driver-verified query modules; each registers into registry._REGISTRY."""
