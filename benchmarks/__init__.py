"""On-chip probes and the torch reference oracle (not shipped in the package)."""
