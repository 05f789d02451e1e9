"""Reusable column-level function libraries (SURVEY.md package layout)."""
