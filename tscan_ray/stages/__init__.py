"""Ray Data stages: stateful map_batches actor classes and stateless batch fns."""
