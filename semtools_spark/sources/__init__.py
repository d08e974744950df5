"""Sources: deterministic synthetic corpora and table readers."""
