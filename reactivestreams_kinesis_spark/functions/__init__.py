"""Expression-level function helpers (vector math, hashing) — no UDFs."""
