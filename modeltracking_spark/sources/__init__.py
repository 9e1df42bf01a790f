"""Ingest sources (SURVEY.md §2.1 S1-S5): schema-explicit track CSV
readers and the KMZ/KML placemark extractor."""
