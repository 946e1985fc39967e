"""Sources: parquet (primary), JDBC (gated — no driver jar in-container),
catalog listing."""
