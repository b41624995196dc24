"""Arrow-vectorized HTML→text extraction stage.

One scalar pandas_udf over the binary ``html`` column, calling the SAME
extractor module as the oracle (quality_filter/text/extraction.py) —
byte-identical output per url by construction.  The decode step is the
row-level analog of the reference's image-decode stage
(/root/reference/opennsfw2/_inference.py:30-33).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quality_filter.text.extraction import extract_text_from_bytes


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_from_bytes)


def extracted_text_col(text: Column, html: Column) -> Column:
    """``coalesce(text, extract(html))`` — pre-populated text rows skip
    extraction (the in-memory-handle passthrough analog,
    /root/reference/opennsfw2/_inference.py:31-32).  The UDF is only
    evaluated where ``text`` is NULL thanks to conditional evaluation."""
    return F.when(text.isNotNull(), text).otherwise(extract_text_udf(html))
