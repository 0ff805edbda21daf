"""Plan layer: stage sequencing with snapshot checkpoints + resume."""
