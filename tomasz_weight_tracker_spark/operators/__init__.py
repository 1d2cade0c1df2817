"""Operator library: each module re-expresses a family from SURVEY.md §2."""
