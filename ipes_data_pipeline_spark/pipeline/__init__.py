"""Medallion pipeline stages: bronze (flatten) → silver (structure) →
gold (enrich). Each stage is a pure DataFrame→DataFrame function; layers
persist as Parquet and every stage is independently re-runnable
(replacing the reference's subprocess-per-stage + file-handoff driver,
``run_pipeline.py:47-89``).
"""
