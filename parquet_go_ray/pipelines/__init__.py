"""End-to-end Ray Data pipelines: encode, decode, verify."""
