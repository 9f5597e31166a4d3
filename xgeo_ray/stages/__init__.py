"""Stateless and stateful pipeline stages (map_batches bodies)."""
