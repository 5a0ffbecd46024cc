from .runner import stream_grouped_counts, stream_events  # noqa: F401
