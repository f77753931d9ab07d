"""Deterministic corpus / media-recipe sources and table loaders."""
