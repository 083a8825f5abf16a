"""Structured Streaming query builders + the DIS sink."""
