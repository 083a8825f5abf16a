"""Declared operator surface (SURVEY.md §2): connector, relational, LLM-pipeline."""
