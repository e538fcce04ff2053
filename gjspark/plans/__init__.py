"""Job plans: the end-to-end spatial pipeline, checkpointed writes with
per-partition lineage + metrics, and the spark-submit entry point."""
