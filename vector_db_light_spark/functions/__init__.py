"""Column-level function library (all JVM-side Catalyst expressions)."""
