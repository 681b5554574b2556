"""Structured Streaming pipelines + the scheduler shim.

The reference triggers each ingestion process either on-demand or on a
cron schedule (scheduler.sh / scheduler.yaml, init_script/init_main.py).
Spark-first, continuous ingestion is a Structured Streaming job:
readStream -> event-time windowed transforms with watermarks ->
writeStream into partitioned parquet collections. The scheduler shim
keeps config-file parity for batch (non-continuous) processes.
"""
