"""Reusable operator library: every operator is ``(DataFrame, params) → DataFrame``."""
