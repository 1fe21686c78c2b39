"""End-to-end pipelines (SURVEY §7.0 flagship + variants)."""
