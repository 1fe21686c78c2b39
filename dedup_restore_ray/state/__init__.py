"""Lineage manifests, metrics, resumable output."""
