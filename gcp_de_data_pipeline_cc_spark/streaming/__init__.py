"""Structured Streaming tier: incremental file ingest with archive
(the reference's sensor+archive lifecycle) and event-time analytics."""
