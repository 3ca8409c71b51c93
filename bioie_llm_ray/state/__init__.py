"""State: checkpoints, lineage manifests, legacy-format compatibility sinks."""
