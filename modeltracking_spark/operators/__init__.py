"""Relational + extension operators (SURVEY.md §2).

Each module composes DataFrame builtins; no RDDs, no custom physical
operators. Python UDFs appear only where semantics genuinely require them
(multimodal decode stubs, Vincenty).
"""
