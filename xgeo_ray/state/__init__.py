"""Durable table state: manifests, watermarks, schema registry."""
