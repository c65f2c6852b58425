"""Composed plan shapes: dedup, similarity search, spatial joins, top-k,
sessionization. Each operator is a function DataFrame → DataFrame built
from built-in relational primitives (the custom-operator preference order
of SURVEY §2.10: compose built-ins first, Pandas UDF second, never a
hand-scheduled RDD)."""
