"""Placeholder — filled in by later milestones."""

QUERIES: dict = {}
