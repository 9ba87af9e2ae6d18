"""Sources: fixture-table scans + the synthetic `images` generator."""
