"""Format layer: one module per container type."""
