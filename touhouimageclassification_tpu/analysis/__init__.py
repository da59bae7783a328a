"""Evaluation harness and augmentation visualizer."""
