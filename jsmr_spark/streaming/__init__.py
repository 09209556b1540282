"""Structured Streaming twins of the batch q_stream_* operators."""
