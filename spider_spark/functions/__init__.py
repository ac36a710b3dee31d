"""Column-level function library: URL ops, normalize-stage scalars, text stats."""
