"""Table IO: checkpointed stage tables, readers for fixture/test data."""
