"""Stages: stateful actor-pool callables and shuffle-shaped operators."""
