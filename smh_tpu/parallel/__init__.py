"""Multi-chip scaling: batch-of-frames data parallelism over a device mesh."""
