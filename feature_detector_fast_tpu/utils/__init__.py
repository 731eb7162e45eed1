"""Host-side utilities: image I/O, hashing, metrics, tracing."""
