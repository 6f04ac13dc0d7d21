"""End-to-end pipeline plans and lineage/metrics capture."""
