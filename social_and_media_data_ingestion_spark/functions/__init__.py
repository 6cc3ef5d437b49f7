"""Scalar function library (SURVEY §2.7)."""
