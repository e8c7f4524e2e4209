"""Structured Streaming surface over the events table.

    events   file-source stream, watermarked windowed aggregations
             (tumbling/sliding/session), streaming dedup, availableNow
             batch-parity runner
"""
