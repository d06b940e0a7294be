"""newsspark — PySpark-native main-content extraction engine.

From-scratch reimplementation of the per-document capabilities of
``jonghhhh/news_article_extractor`` (see SURVEY.md), re-expressed as a
vectorized pandas/Arrow UDF pipeline over Common-Crawl-style pages tables.
"""

__version__ = "0.1.0"
