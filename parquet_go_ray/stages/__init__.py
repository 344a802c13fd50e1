"""Ray Data stages: salting, stateful encoder actors, verification."""
