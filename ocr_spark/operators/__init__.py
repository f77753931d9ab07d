"""Per-page numpy operators and table-level DataFrame operators."""
