"""Operator/function library: relational, text, dedup, ANN, multimodal."""
