"""Structured Streaming: incremental transfer + stateful event analytics."""
