"""Standalone tools: weight conversion, dataset splitting."""
