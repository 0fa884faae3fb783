"""Device codecs: batched JAX/Pallas encode/decode drivers."""
