"""Pipelines: end-to-end Dataset chains composing sources, stages, sinks."""
