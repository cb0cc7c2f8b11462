"""Shared utilities: validation, config, PRNG."""
