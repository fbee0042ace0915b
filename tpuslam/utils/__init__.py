"""Utilities: timing, logging, observability."""
