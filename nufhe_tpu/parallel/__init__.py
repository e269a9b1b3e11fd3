"""Multi-chip sharding and collectives."""
