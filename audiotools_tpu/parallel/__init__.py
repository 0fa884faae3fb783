"""Mesh sharding and job scheduling."""
