"""Structured Streaming variants of the batch surface."""
