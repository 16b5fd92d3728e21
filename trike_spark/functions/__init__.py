"""Column-expression function library (pure, reusable across batch and
streaming — the streaming pipeline composes these under readStream)."""
