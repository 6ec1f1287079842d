"""Placeholder — filled in a later wave."""

QUERIES = {}
ORACLE = {}
