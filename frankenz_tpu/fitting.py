"""Placeholder — fitter facade, populated with the fitters."""
