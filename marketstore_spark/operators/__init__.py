"""Operators: each reference capability as a DataFrame -> DataFrame
transformation (see SURVEY.md §2 for the inventory)."""
