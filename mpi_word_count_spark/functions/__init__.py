"""Scalar/vector function layer shared by operators and oracle SQL."""
