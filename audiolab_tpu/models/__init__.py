"""Flax model zoo.

Every family the reference ships (SURVEY §2.3), re-implemented as flax
modules running on XLA/Pallas — weights convert from the torch checkpoints
once via audiolab_tpu.models.convert.
"""
