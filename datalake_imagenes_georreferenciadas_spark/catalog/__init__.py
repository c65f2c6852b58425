"""The reference's relational metadata model (catalog / runs / lineage) on
Parquet — SURVEY §1.4, M2."""

from .store import CatalogStore  # noqa: F401
