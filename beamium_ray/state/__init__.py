"""Run state: lineage manifests, resume, retention."""
