"""End-to-end pipelines (the reference's scrape→route→forward lifecycle)."""
