"""Operator modules — the engine's computational surface.

Each module re-expresses one slice of the reference's semantics
(see SURVEY.md §2) as declarative DataFrame transformations.
"""
