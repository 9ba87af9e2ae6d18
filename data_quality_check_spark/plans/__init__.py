"""Plans: end-to-end pipeline assembly, catalog abstraction,
checkpoint/resume protocol."""
