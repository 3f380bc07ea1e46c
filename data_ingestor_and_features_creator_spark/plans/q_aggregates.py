"""Placeholder — filled in by build plan step."""
