"""Sources: GeoJSON FeatureCollections, CSV point tables, Iceberg-shaped
image tables. Each yields a canonical DataFrame schema (SURVEY.md §1.1)."""
