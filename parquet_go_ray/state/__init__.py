"""Partition blob container + checkpoint/lineage manifest."""
