"""Native (C++) graph runtime. Falls back to pure Python when not built."""
