"""Infra utilities: seeding, batching, disk janitor."""
