"""Pipeline operators: normalize → block → score → route → cluster →
merge, plus the dedup suite, ANN search, multimodal plumbing, and
observability (metrics / anomalies / quality gates)."""
