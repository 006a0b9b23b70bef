"""Crawl planning: round policy, the batch engine, snapshots (SURVEY.md §3)."""
