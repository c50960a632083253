"""Operator library: each module groups one family from SURVEY.md §2."""
