from .synth import ensure_binlog, list_epochs, list_segments, synthesize_binlog

__all__ = ["ensure_binlog", "list_epochs", "list_segments", "synthesize_binlog"]
