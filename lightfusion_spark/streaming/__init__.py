"""Structured Streaming surface: watermarked windows, session windows and
streaming dedup over the events stream — see :mod:`.events`."""

from . import events

__all__ = ["events"]
