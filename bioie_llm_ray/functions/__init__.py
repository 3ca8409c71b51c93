"""Stateless, vectorizable functions used inside map_batches stages."""
