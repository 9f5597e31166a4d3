"""Pluggable sources/sinks (the reference's FeatureReader surface,
/root/reference/io/interface.go:3-5, re-expressed over ray.data)."""
