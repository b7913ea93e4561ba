"""Generic utilities: polynomials, evaluation domains, serialization, profiling."""
