"""Sources and sinks (scan, parse, table registry)."""
