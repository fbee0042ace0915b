"""Host-side data ingestion: synthetic worlds, scan logs."""
