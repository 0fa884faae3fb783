"""Scalar NumPy reference codecs (differential-test oracles)."""
