"""External sources/sinks: JDBC partitioned-read specs, cross-engine type
mapping, S3-style schema inference."""
