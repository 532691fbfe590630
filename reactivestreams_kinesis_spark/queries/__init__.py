"""Registered queries, one module per operator family (SURVEY.md §2)."""
