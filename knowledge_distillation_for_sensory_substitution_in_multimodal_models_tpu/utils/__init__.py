"""Shared utilities: synthetic batch construction, logging, profiling."""
