"""Operator inventory (SURVEY.md §2) as reusable DataFrame transformations."""
