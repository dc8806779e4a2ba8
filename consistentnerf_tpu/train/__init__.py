"""Training layer: losses, metrics, schedules, state, step, loop, eval."""
