"""Registered query/oracle pairs, grouped by operator area (SURVEY.md §2)."""
