"""Encrypted circuit families (gates, integer operators)."""
