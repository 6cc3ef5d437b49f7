"""Sources: NDJSON(.zst) scans, HTML-article UDTF, tweet-page flattener,
cursor-paginated REST ingestion."""
