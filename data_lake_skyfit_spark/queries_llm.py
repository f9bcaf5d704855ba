"""Placeholder module — LLM-pipeline queries register here (filled in below)."""
