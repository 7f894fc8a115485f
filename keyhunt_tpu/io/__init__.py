"""Host-side I/O: target parsing, base58, result sinks, persistence."""
