"""Scalar/array function helpers shared by operators and query plans."""
