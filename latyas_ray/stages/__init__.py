from .extract_stage import ExtractStage, extract_batch

__all__ = ["ExtractStage", "extract_batch"]
