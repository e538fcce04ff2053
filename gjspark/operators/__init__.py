"""Engine operators: cell assignment, spatial joins (PIP, kNN), tiling,
template rendering, find-or-create upserts, validators, dedup, ANN."""
