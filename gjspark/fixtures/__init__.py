"""Deterministic synthetic fixtures (seed 42) — see FIXTURES.md."""
