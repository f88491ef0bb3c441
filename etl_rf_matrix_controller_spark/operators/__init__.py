"""Placeholder -- filled in by build plan order (SURVEY.md SS7)."""
