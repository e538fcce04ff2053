"""Structured Streaming analogues of the validator operators.

The reference is a batch tool (SURVEY.md §2.8); these exist because the
engine's validators (V2/V3) have natural streaming semantics: watermarked
dedup and append-only newest-first filtering for continuously-arriving
observation batches."""
