"""Placeholder — populated in this round (SURVEY.md §2)."""
