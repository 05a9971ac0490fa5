"""Framework utilities: tracing/profiling, config, serialization, math."""
