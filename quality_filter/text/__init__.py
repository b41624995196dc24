from quality_filter.text.extraction import extract_text, extract_text_from_bytes

__all__ = ["extract_text", "extract_text_from_bytes"]
