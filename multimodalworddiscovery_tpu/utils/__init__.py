"""Utilities: checkpointing, logging, plotting."""
