"""End-to-end pipeline plans (scan → dedup → salt → extract → write)."""
