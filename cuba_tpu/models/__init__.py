"""Graph model: user-facing vertex/edge types and the optimizer API."""
