"""Declarative DataFrame plans used by the driver-gated query set."""
