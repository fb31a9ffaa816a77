"""Utilities: logging, metrics, recall math."""
