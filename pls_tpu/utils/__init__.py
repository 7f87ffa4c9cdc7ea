"""IO, reporting, RNG-compatibility and checkpointing utilities."""
