"""Sources & sinks: deterministic synthetic web_pages corpus, the
snapshot catalog (parquet+manifest now, Iceberg behind the same
interface), and testdata readers."""
