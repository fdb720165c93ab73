"""Placeholder — plotting/diagnostics, populated in a later milestone."""
