"""Public column-function surface — the engine's scalar/HOF toolkit in
one importable namespace (SURVEY.md §2.7, §2.11 [EXT]).

Everything here is a pure Catalyst ``Column`` builder (or a tiny
driver-side helper): composable into any DataFrame expression, fully
inside whole-stage codegen, zero Python UDFs. The implementations live
beside their operator families (``operators/textstats.py`` etc.); this
module is the discoverable façade — the equivalent of the reference's
``utils/helper.py`` grab-bag (month windows, key parsing), typed and
engine-side.

    from open_crime_etl_pipeline_spark import functions as CF
    df.select(CF.tokens("text"), CF.quality_score("text"))
"""

from ..operators.textstats import (
    PII_PATTERNS,
    avg_token_length,
    bpe_ish_tokens,
    pii_counts,
    pii_redact,
    quality_score,
    stopword_ratio,
    tokens,
    unique_token_ratio,
)
from ..operators.zorder import (
    morton_key,
    morton_key_nd,
    morton_sql,
    morton_sql_nd,
)
from ..queries.core import dec2, fmt_date
from ..sources.socrata import month_windows

__all__ = [
    "PII_PATTERNS",
    "avg_token_length",
    "bpe_ish_tokens",
    "dec2",
    "fmt_date",
    "month_windows",
    "morton_key",
    "morton_key_nd",
    "morton_sql",
    "morton_sql_nd",
    "pii_counts",
    "pii_redact",
    "quality_score",
    "stopword_ratio",
    "tokens",
    "unique_token_ratio",
]
