"""DataFrame-level operators (each returns a lazy DataFrame plan)."""
