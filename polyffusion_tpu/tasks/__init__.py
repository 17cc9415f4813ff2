"""Trainable task wrappers (the reference's ``models/`` layer)."""

from .sdf import SDFTask  # noqa: F401
