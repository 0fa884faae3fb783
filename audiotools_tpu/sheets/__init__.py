"""Cuesheet / TOC parsing."""
