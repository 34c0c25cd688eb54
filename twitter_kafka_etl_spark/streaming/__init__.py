"""Structured Streaming layer (SURVEY.md §2.9).

Replaces the reference's wall-clock directory windowing + sleep-retry
(consumer.scala:69-70,89-123) with event-time windows and watermarks.
"""
