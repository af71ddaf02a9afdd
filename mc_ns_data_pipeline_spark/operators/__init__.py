"""Relational + training-data operator surface.

Modules: projections, joins, aggregations (reference parity, SURVEY §2);
dedup, similarity, multimodal (large-scale training-data extensions).
"""
