"""Inference/serving: one jitted predict graph reused by the CLI, the batch
judge, the dataset filter, and the web daemon."""
