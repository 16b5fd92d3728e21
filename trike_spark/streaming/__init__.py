"""Structured Streaming implementation of the trike pipeline:
sources → stateful framing/session (applyInPandasWithState) → heartbeat
filter → CloudEvent projection → ordered keyed Kinesis sink (foreachBatch).
"""
