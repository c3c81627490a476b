"""Multi-chip scaling: landmark-sharded assembly + ICI-reduced Schur
complement over a jax.sharding.Mesh.  A new capability vs the single-GPU
reference (SURVEY.md §2 'Parallelism / distribution inventory')."""
