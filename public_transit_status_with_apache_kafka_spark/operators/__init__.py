"""Composite operators: source-agnostic DataFrame -> DataFrame transforms.

Each function takes already-loaded DataFrames so the same logic serves
batch (parquet fixtures, DuckDB-verified) and streaming (file/kafka
sources via foreachBatch) — SURVEY.md section 7.0 design stance.
"""
