"""Scalar / vector function library used inside map_batches stages."""
