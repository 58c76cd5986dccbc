"""Host-side utilities: image IO, colour conversion, metrics, profiling."""
