"""Sources: synthetic page-corpus generator + table readers/adapters."""
