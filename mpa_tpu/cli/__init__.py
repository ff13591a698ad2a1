"""CLI entry points (registry-addressed models, typed config with --overrides)."""
