"""PySpark-native crawl/extract analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of ``dominik3141/notJustHtml-searchEngine`` (a Go web
crawler) as an idiomatic PySpark engine: batch BFS rounds over a
partitioned, checkpointed frontier table, exact seen-set anti-joins
with bloom-shard pre-filters, per-host politeness windows, and all
extraction kernels as vectorized pandas/Arrow UDFs.

Blueprint: SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
