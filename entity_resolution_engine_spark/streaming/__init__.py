"""Structured-Streaming surface: incremental resolution + windowed
stream metrics.  The reference is strictly batch (SURVEY.md §2.10);
this module is the engine's forward path for continuously-arriving
crawl data."""
