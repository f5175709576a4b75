"""End-to-end pipelines: corpus validation suite, driver-contract queries,
and the reference-parity log pipeline."""
