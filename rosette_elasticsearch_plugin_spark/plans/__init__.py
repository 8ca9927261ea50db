"""Logical plans: pipeline composition (the reference's ordered
processor chain) and the end-to-end entity-resolution plan."""
