"""Sources & sinks: landing CSV ingest (raw→staging two-step), warehouse
table sinks, and the schemas of the reference's entity tables."""
