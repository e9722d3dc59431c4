"""Operator library (SURVEY.md §2). Each module exposes pure DataFrame→DataFrame functions."""
