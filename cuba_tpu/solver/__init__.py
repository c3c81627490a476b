"""Numeric pipeline: problem compiler, system assembly, Schur complement,
reduced-system solvers, and the on-device Levenberg-Marquardt driver."""
