"""Source readers for the CODEX pipeline (SURVEY.md §2.1 S1-S10)."""
