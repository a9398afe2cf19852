"""Structured Streaming re-expression of the reference's macro-batch
pipeline (SURVEY.md §2.8): the sensor→validate→transform→archive DAG
becomes one streaming query with Trigger.AvailableNow and
cleanSource=archive."""
