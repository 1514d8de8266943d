"""Output sinks: Turtle serialization (S12/S13), mappings-file IR (S16)."""
