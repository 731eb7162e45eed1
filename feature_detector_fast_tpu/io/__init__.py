"""Dataset loading: TUM-format sequences and synthetic generators."""
