"""The reference's three lifecycles as DataFrame programs (SURVEY.md §3)."""
