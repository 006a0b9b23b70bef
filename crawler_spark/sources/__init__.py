"""Sources & sinks: snapshotted state tables, seed readers (SURVEY.md §2.1)."""
