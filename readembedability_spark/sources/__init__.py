"""Sources: pages table reader + deterministic synthetic corpus."""
